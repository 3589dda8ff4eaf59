from rcnn_ocr_tpu.data.transforms import (  # noqa: F401
    ResizeAndPad,
    build_file_index,
    get_train_transform,
    get_val_transform,
    imread_cv2,
    load_rgb_uint8,
)
from rcnn_ocr_tpu.data.dataset import (  # noqa: F401
    OCRDataset,
    MultiDataset,
    ProportionalBatchSampler,
)
from rcnn_ocr_tpu.data.cache import TransformCache  # noqa: F401
