from rcnn_ocr_tpu.interop.torch_import import (  # noqa: F401
    import_torch_checkpoint,
    import_torch_state_dict,
)
