"""Minimal OCR inference example — mirror of the reference's
`minimal_inference.py`: load a checkpoint + charset, predict one image.

Works with this framework's msgpack checkpoints *and* the reference's
.pth checkpoints (imported on the fly).
"""

import sys

from rcnn_ocr_tpu.inference import OCRInference


def main():
    model_path = sys.argv[1] if len(sys.argv) > 1 else "exp1/best_acc_weights.msgpack"
    charset_path = sys.argv[2] if len(sys.argv) > 2 else "configs/charset.txt"
    image_path = sys.argv[3] if len(sys.argv) > 3 else "test.png"

    ocr = OCRInference(model_path, charset_path, device="auto")
    text = ocr.predict(image_path)
    print(f"Result: '{text}'")


if __name__ == "__main__":
    main()
