from rcnn_ocr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    DEFAULT_TP_RULES,
)
