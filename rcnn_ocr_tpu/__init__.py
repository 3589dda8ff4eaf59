"""rcnn_ocr_tpu — a TPU-native text-line recognition (OCR) framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
sherstpasha/RCNN-OCR (reference: /root/reference): SE-ResNet31 backbone,
BiLSTM encoder, additive-attention seq2seq decoder, plus a first-class CTC
head with greedy/beam decoding, a CSV/TSV multi-dataset pipeline, a full
training loop with pjit data parallelism over a TPU mesh, three-slot
checkpointing, an inference API, evaluation CLI, dataset visualizer and an
HPO driver.

Nothing here is a port: the compute path is functional JAX (static shapes,
`lax.scan` recurrences, bf16 on the MXU), parallelism is `jax.sharding`
over a `Mesh`, and the hot ops have Pallas TPU kernels.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor the documented env var even when a host sitecustomize has
    # already forced a platform programmatically (jax's config, once set
    # in-process, wins over the env; we restore env-var semantics here).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

if _os.environ.get("RCNN_OCR_COMPILE_CACHE"):
    # Process-wide persistent XLA compile cache (the per-CLI flags and the
    # training config key remain; the env var covers every tool/bench
    # uniformly — decisive where compiles tunnel to a remote service).
    from rcnn_ocr_tpu.utils.common import enable_compile_cache as _ecc

    try:
        _ecc(_os.environ["RCNN_OCR_COMPILE_CACHE"])
    except Exception:
        pass

from rcnn_ocr_tpu.vocab.charset import (  # noqa: F401
    load_charset,
    decode_tokens,
    pack_attention_targets,
    pack_ctc_targets,
    Charset,
)
from rcnn_ocr_tpu.training.config import Config  # noqa: F401
