from rcnn_ocr_tpu.ops.ctc import (  # noqa: F401
    ctc_beam_search,
    ctc_greedy_collapse_np,
    ctc_greedy_decode_jnp,
    ctc_loss,
    ids_to_text,
)
from rcnn_ocr_tpu.ops.preprocess import host_letterbox, resize_pad_normalize  # noqa: F401
from rcnn_ocr_tpu.ops.quant import (  # noqa: F401
    int8_conv_nhwc,
    int8_conv_nhwc_static,
    quantize_activation,
    quantize_weight_per_cout,
)
from rcnn_ocr_tpu.ops.stem import (  # noqa: F401
    depth_to_space,
    s2d_kernel,
    space_to_depth_pad1,
)
