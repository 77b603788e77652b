# N3K1 crash bisect (b): XLA-gather RoIAlign instead of the Pallas
# kernel — isolates the Pallas kernel as the faulting component if (a)
# at batch 8 also crashes.
_base_ = ["fgn_train_mnistiseg_n3k1_adam.py"]

model = dict(use_pallas_roi_align=False)
work_dir = "runs/mnistiseg_n3k1_jnp"
