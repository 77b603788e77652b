"""Model-debug visualizer smoke tests (fgn_tpu/models/viz.py).

Reference parity: fgn.py:305-477 support/query fmap and cls score-map
debug dumps. Moved out of test_config.py (round-4 org cleanup).
"""

import numpy as np


def test_viz_helpers_smoke(tmp_path, rng):
    import numpy as np

    from fgn_tpu.models.viz import (
        visualize_cls_scores,
        visualize_qry_fmaps,
        visualize_spp_fmaps,
    )

    spp = rng.rand(3, 8, 8, 16).astype(np.float32)
    img1 = visualize_spp_fmaps(spp, str(tmp_path / "spp.png"))
    assert img1.ndim == 2 and img1.size > 0
    qf = rng.rand(8, 8, 16).astype(np.float32)
    qmod = rng.rand(3, 8, 8, 16).astype(np.float32)
    img2 = visualize_qry_fmaps(qf, qmod, str(tmp_path / "qry.png"))
    assert img2.size > 0
    cls = rng.randn(3, 8, 8, 5).astype(np.float32)
    img3 = visualize_cls_scores(cls, str(tmp_path / "cls.png"))
    assert img3.size > 0
    import os

    assert all(
        os.path.exists(str(tmp_path / f)) for f in ("spp.png", "qry.png", "cls.png")
    )
