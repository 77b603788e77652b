"""fgn_tpu — a TPU-native few-shot instance-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the FGN
reference stack (tooHotSpot/FGN): the episodic N-way K-shot dataset engine
over MNISTISEG / OMNIISEG / COCO / VOC, the FGN detector (attention-guided
RPN, relation-guided box head, support-gated class-agnostic mask head),
training / finetuning / episodic COCO-style evaluation, and synthetic
dataset generators.

Design stance (vs the reference's PyTorch+MMDetection implementation):
  * everything after episode construction runs inside one jitted step —
    static padded shapes, masked ops, no dynamic control flow;
  * data parallelism via a 1-D ``jax.sharding.Mesh`` (the reference is
    single-GPU; see SURVEY.md §2.8);
  * host-side tooling (RLE, eval matcher) is NumPy + native C++.
"""

__version__ = "0.1.0"
