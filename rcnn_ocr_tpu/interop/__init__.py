from rcnn_ocr_tpu.interop.torch_import import (  # noqa: F401
    import_torch_checkpoint,
    import_torch_state_dict,
)
from rcnn_ocr_tpu.interop.torch_export import (  # noqa: F401
    export_torch_state_dict,
    save_torch_checkpoint,
)
