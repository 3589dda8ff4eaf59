from rcnn_ocr_tpu.utils.common import (  # noqa: F401
    enable_compile_cache,
    load_model,
    set_seed,
)
from rcnn_ocr_tpu.utils.profiling import trace, StepTimer  # noqa: F401
