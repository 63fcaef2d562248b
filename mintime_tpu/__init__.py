"""MINTIME-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video deepfake-detection
framework with the capabilities of MINTIME (Multi-Identity size-iNvariant
TIMEsformer, reference: davide-coccomini/MINTIME-...).

Built TPU-first from scratch: all ragged per-video logic (identity sorting,
adaptive slot assignment, masks, positions) lives on the host in the
:mod:`mintime_tpu.data` sequence assembler, producing fixed-shape batches;
the compute path (CNN backbones + size-invariant TimeSformer with divided
space-time attention) is pure JAX/Flax compiled by XLA, with Pallas kernels
for the masked attention hot path; scaling is expressed with
``jax.sharding.Mesh`` + ``jit`` shardings (see :mod:`mintime_tpu.parallel`).
"""

__version__ = "0.1.0"

from mintime_tpu.config import (  # noqa: F401
    MintimeConfig,
    ModelConfig,
    TrainingConfig,
    load_config,
)
