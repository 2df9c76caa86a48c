"""TPU-native temporal sentence grounding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
haojc/ShufflingVideosForTSG (ECCV 2022 "Can Shuffling Video Benefit Temporal
Bias Problem", plus the QAVE baseline): the shuffling training framework
(pseudo-video generation by GT-moment translation, cross-modal semantic
matching, inter-video KL consistency, temporal-order discrimination) and the
QAVE query-aware video encoder, evaluated on the Charades-CD / ActivityNet-CD
re-divided splits.

Design stance (see SURVEY.md §7): functional core (flax.linen modules, pure
jitted train/eval steps), scan-based fused BiLSTMs, batched SCDM attention
(no per-word loops), O(T) span decoding, on-device pseudo-video permutation
keyed by JAX PRNG, and pjit/shard_map data parallelism over a device mesh.
"""

__version__ = "0.1.0"
