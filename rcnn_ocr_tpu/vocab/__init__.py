from rcnn_ocr_tpu.vocab.charset import (  # noqa: F401
    Charset,
    load_charset,
    decode_tokens,
    pack_attention_targets,
    pack_ctc_targets,
)
