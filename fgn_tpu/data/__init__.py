from fgn_tpu.data.episodic import FewShotISEG
from fgn_tpu.data.batching import (
    EpisodeBatch,
    EpisodeMeta,
    EpisodeLoader,
    collate_episodes,
)
from fgn_tpu.data.fst_bindings import (
    COCOFewShot,
    MNISTFewShotISEG,
    OMNIFewShotISEG,
    VOCFewShot,
    init_ds_class_by_config,
)
from fgn_tpu.data.mnistiseg import MNISTISEG, OMNIISEG
