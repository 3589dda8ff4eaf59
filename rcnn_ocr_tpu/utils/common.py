"""Misc utilities: seeding and standalone model loading.

`load_model` is the live equivalent of the reference's (dead) ``load_crnn``
(`/root/reference/training/utils.py:70-119`): build the model from any
checkpoint — this framework's msgpack slots or the reference's ``.pth``
layouts — resolving the charset from the file when embedded.
"""

from __future__ import annotations

import random
from typing import Any, Dict, Optional, Tuple

import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed host-side RNGs.

    JAX randomness is explicit (`jax.random.PRNGKey`), so unlike the
    reference (`/root/reference/training/utils.py:61-67`) there are no
    global device-RNG or precision toggles to set; bf16/fp32 policy is a
    model constructor argument.
    """
    random.seed(seed)
    np.random.seed(seed)


def enable_compile_cache(cache_dir: str) -> None:
    """Enable JAX's persistent compilation cache rooted at ``cache_dir``.

    Measured on this platform (`tools/compile_cache_probe.py`): the cache
    works through the remote-compile tunnel — a 3-conv probe compiles in
    199-335 s cold and 3 s on a warm cache — so pointing serving processes
    at a shared directory removes the dominant cold-start cost on restart.
    The reference has no equivalent (torch eager recompiles nothing); this
    is a TPU-specific operational concern.

    Must be called before the first jit compilation in the process.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: serving graphs are few and all expensive here
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def load_model(
    checkpoint_path: str,
    itos: Optional[list] = None,
    stoi: Optional[dict] = None,
    charset_path: Optional[str] = None,
    hidden_size: Optional[int] = None,
    dtype: Any = None,
) -> Tuple[Any, Dict[str, Any], Any]:
    """Load (model, variables, charset) from a checkpoint file.

    Charset resolution order: explicit ``itos``/``stoi`` > ``charset_path``
    > charset embedded in a full checkpoint.
    """
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference, infer_architecture
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.vocab.charset import Charset

    variables, meta = OCRInference._load_variables(checkpoint_path)

    if itos is not None:
        charset = Charset.from_tokens(itos)
    elif stoi is not None:
        # stoi alone works too (the docstring promised it and the old
        # code ignored it): rebuild the token order from the id mapping
        inv = {int(v): k for k, v in stoi.items()}
        charset = Charset.from_tokens([inv[i] for i in range(len(inv))])
    elif charset_path is not None:
        charset = Charset.from_file(charset_path)
    elif meta.get("itos"):
        charset = Charset.from_tokens(meta["itos"])
    else:
        raise ValueError(
            "charset required: pass itos/stoi or charset_path, or use a full "
            "checkpoint with an embedded charset"
        )

    arch = infer_architecture(variables.get("params", {}))
    model = RCNN(
        num_classes=charset.num_classes,
        hidden_size=int(hidden_size or meta.get("hidden_size") or arch.get("hidden_size") or 256),
        sos_id=charset.sos_id,
        eos_id=charset.eos_id,
        pad_id=charset.pad_id,
        blank_id=charset.blank_id,
        with_attention_head=arch.get("with_attention_head", True),
        with_ctc_head=arch.get("with_ctc_head", False),
        ctc_blank_id=charset.ctc_blank_id,
        lstm_layers=arch.get("lstm_layers", 2),
        width_mult=arch.get("width_mult", 1.0),
        dtype=dtype if dtype is not None else jnp.float32,
    )
    return model, variables, charset
