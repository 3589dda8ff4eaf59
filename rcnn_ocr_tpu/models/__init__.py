from rcnn_ocr_tpu.models.seresnet31 import SEResNet31, SELayer, SEBasicBlock  # noqa: F401
from rcnn_ocr_tpu.models.lstm import BiLSTM  # noqa: F401
from rcnn_ocr_tpu.models.attention import AttentionDecoder  # noqa: F401
from rcnn_ocr_tpu.models.rcnn import RCNN  # noqa: F401
