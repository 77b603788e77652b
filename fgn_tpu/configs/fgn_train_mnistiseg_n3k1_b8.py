# N3K1 crash bisect (a): batch 8 instead of the reference heuristic's
# 10 — distinguishes an HBM-OOM worker crash from a geometry-specific
# kernel fault (N3K1 at b10 killed the TPU worker at step 0 twice;
# N3K3 b8 / N1K1 b12 / OMNI b8 all run clean).
_base_ = ["fgn_train_mnistiseg_n3k1_adam.py"]

train_ds_cfg = dict(batch=8)
batch_size = 8
work_dir = "runs/mnistiseg_n3k1_b8"
