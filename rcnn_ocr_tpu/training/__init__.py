from rcnn_ocr_tpu.training.config import Config  # noqa: F401
