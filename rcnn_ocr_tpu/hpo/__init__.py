from rcnn_ocr_tpu.hpo.driver import run_hpo  # noqa: F401
