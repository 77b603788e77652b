# N3K1 at the REFERENCE batch heuristic (main.py:493-499 -> batch 10):
# b10 killed the TPU worker at step 0 in rounds 3-4 on the old kernel
# path. reports/hbm_budget.md (round 5): XLA compiled peak is 5.65 GB
# at b10 (remat off) on a 16 GB chip, so the crash was never a
# static-graph HBM overflow — this config re-runs the extended-schedule
# cell at the reference batch on the round-5 code to prove it out
# (FGNConfig.remat stays off: the faithful setting).
_base_ = ["fgn_train_mnistiseg_n3k1.py"]

max_epochs = 8
lr_schedule = dict(decay_epochs=[6])
work_dir = "runs/mnistiseg_n3k1_b10"
# batch_size 10 inherited from fgn_train_mnistiseg_n3k1.py
