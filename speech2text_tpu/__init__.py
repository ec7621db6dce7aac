"""speech2text_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-to-text framework.

A from-scratch rebuild of the capabilities of guangkun0818/speech2text
(reference mounted read-only at /root/reference), designed TPU-first:

- fixed-shape bucketed batches, lengths-as-masks (SPMD friendly)
- feature extraction (kaldi-compatible log-mel fbank) runs **on device**
  inside the jitted train step, not in CPU dataloader workers
- CTC / RNN-T / pruned RNN-T losses are lax.scan / Pallas lattice kernels
- one `jax.sharding.Mesh`, pjit train steps, XLA collectives (no NCCL)
- explicit training loop (no Lightning), orbax checkpoints

Task families (parity with reference build_task.py:37-45):
  CTC, Rnnt, CTC_Hybrid_Rnnt, Pruned_Rnnt, SSL (BEST-RQ), CIF, NNLM
"""

__version__ = "0.1.0"
