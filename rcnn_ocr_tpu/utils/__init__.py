from rcnn_ocr_tpu.utils.common import set_seed, load_model  # noqa: F401
from rcnn_ocr_tpu.utils.profiling import trace, StepTimer  # noqa: F401
