"""Static int8 activation calibration for the inference engine.

The dynamic int8 path computes a per-call abs-max over every quantized
conv input — a full-tensor reduction barrier that forces the activation
through HBM in float.  Calibration records static scales from sample data
so the quantize-to-int8 step is purely elementwise and fuses into the
previous conv's epilogue (the headline serving configuration: 30.1k img/s
vs 27.4k dynamic, PERF.md).

Mixed into :class:`rcnn_ocr_tpu.inference.OCRInference`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np

ImageLike = Union[np.ndarray, str, "Any"]


class CalibrationMixin:
    """``calibrate`` / ``save_calibration`` for ``OCRInference``."""

    def calibrate(
        self,
        images: Union[ImageLike, List[ImageLike]],
        batch_size: int = 32,
    ) -> None:
        """Post-training calibration: switch the int8 path to STATIC
        activation scales recorded from sample data.

        Call once with a representative sample (>= a few dozen images);
        subsequent ``predict*`` calls use the static path.  Inputs outside
        the calibrated range clip at ±127 · scale.
        """
        from rcnn_ocr_tpu.models import RCNN
        from rcnn_ocr_tpu.ops.augment import device_normalize

        if not self.model.quantize:
            raise ValueError("calibrate() requires OCRInference(quantize=True)")
        images_list: List[ImageLike] = (
            [images] if not isinstance(images, list) else list(images)
        )
        if not images_list:
            raise ValueError("calibration needs at least one image")
        calib_model = RCNN(**{**self._model_kwargs, "act_quant": "static"})
        batch_size = self._round_batch(batch_size)

        def record(variables, batch):
            _, mutated = calib_model.apply(
                variables,
                device_normalize(batch),
                train=False,
                method=calib_model.encode,
                mutable=["quant_stats"],
            )
            return mutated["quant_stats"]

        # seed a zero quant_stats collection up front (via eval_shape — no
        # compile) so every loop iteration passes the SAME pytree structure
        # to the jitted recorder; without it the second chunk retraces
        # (remote compiles here are minutes each)
        batch_spec = jax.ShapeDtypeStruct(
            (batch_size, self.img_h, self.img_w, 3), jnp.uint8
        )
        stats_shapes = jax.eval_shape(record, dict(self.variables), batch_spec)
        zero_stats = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), stats_shapes
        )

        if self._mesh is None:
            record = jax.jit(record)
        else:
            # abs-max stats are scalars: replicated out, batch sharded in
            record = jax.jit(
                record,
                in_shardings=(self._rep, self._data_sh),
                out_shardings=self._rep,
            )

        variables = {**self.variables, "quant_stats": zero_stats}
        for i in range(0, len(images_list), batch_size):
            chunk = images_list[i : i + batch_size]
            arrays, _ = self._pad_rows(
                [self._preprocess(img) for img in chunk], batch_size
            )
            stats = record(variables, self._device_batch(np.stack(arrays)))
            variables = {**variables, "quant_stats": stats}

        self.variables = variables
        self.model = calib_model
        self._jit_cache.clear()  # decode kernels must re-trace the static path

    def save_calibration(self, path: str) -> None:
        """Persist the calibrated static-int8 scales: writes a copy of the
        source checkpoint with ``quant_stats`` embedded.  Re-opening that
        file with ``OCRInference(..., quantize=True)`` activates the static
        path directly — no re-calibration on process start."""
        if "quant_stats" not in self.variables:
            raise ValueError("no calibration recorded; call calibrate() first")
        from flax import serialization

        from rcnn_ocr_tpu.training.checkpoint import load_checkpoint_blob

        host = jax.tree_util.tree_map(np.asarray, self.variables)
        if self.model_path.endswith((".pth", ".pt")):
            # torch sources have no msgpack blob to copy — embed what this
            # engine already knows so the file re-opens standalone
            from rcnn_ocr_tpu.training.checkpoint import CHECKPOINT_FORMAT_VERSION

            blob: Dict[str, Any] = {
                "format_version": CHECKPOINT_FORMAT_VERSION,
                "itos": list(self.charset.itos),
                "stoi": {str(k): int(v) for k, v in self.charset.stoi.items()},
                "config": {
                    "img_h": self.img_h,
                    "img_w": self.img_w,
                    "hidden_size": self._model_kwargs["hidden_size"],
                },
            }
        else:
            blob = dict(load_checkpoint_blob(self.model_path))
        blob["params"] = serialization.to_state_dict(host["params"])
        blob["batch_stats"] = serialization.to_state_dict(
            host.get("batch_stats", {})
        )
        blob["quant_stats"] = serialization.to_state_dict(host["quant_stats"])
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(blob))
        os.replace(tmp, path)
