"""EgoVLP-TPU: a TPU-native egocentric video-language pretraining framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
showlab/EgoVLP (NeurIPS 2022): dual-encoder video-text pretraining with
EgoNCE over a TPU device mesh, divided space-time attention video tower,
DistilBERT text tower, and the full downstream task suite (EgoMCQ,
EPIC-Kitchens MIR, CharadesEgo, Ego4D OSCC / PNR / NLQ / MQ).

Design principles (TPU-first, not a port):
  * All compute paths are jit-compiled XLA with static shapes.
  * Scaling is expressed with ``jax.sharding.Mesh`` + sharding annotations;
    XLA inserts the ICI collectives (the reference used NCCL all-gather +
    DDP, cf. /root/reference/trainer/trainer_egoclip.py:11-27).
  * Hot ops (divided space-time attention) have fused Pallas kernels.
  * Host-side work is limited to video decode + tokenization, performed by
    a native C++ (libav) decode runtime with threaded prefetch.
"""

__version__ = "0.1.0"
