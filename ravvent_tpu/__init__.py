"""ravvent_tpu — a TPU-native nanopore basecalling engine.

A from-scratch JAX/XLA/Pallas re-design of the Ravvent basecaller method
(reference: adamnapieralski/ravvent-basecaller, a TF2+tfa research pipeline):
raw nanopore current and t-test-segmented event features feed stacked (bi)RNN
encoders and a Luong/Bahdanau-attention RNN decoder that autoregressively emits
A/C/G/T tokens; long reads are chunked into overlapping snippets, decoded
greedily or by beam search, and stitched back by local-alignment overlap
merging; accuracy is minimap2-style mapping identity.

Everything on the compute path is jit-compiled JAX (lax.scan recurrence,
fixed shapes, fused decode steps, optional Pallas kernels); scaling is
data-parallel over a `jax.sharding.Mesh`; the host runtime (data pipeline,
assembly, evaluation) is numpy + native C++ helpers.
"""

__version__ = "0.1.0"

from ravvent_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    RunConfig,
)
from ravvent_tpu.tokenizer import NucTokenizer, NUC_TOKENIZER  # noqa: F401
