from rcnn_ocr_tpu.hpo.driver import (  # noqa: F401
    DEFAULT_SPACE,
    PrunedTrial,
    SuccessiveHalvingPruner,
    run_hpo,
)
