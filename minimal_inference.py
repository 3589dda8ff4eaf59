"""Minimal OCR inference example — mirror of the reference's
`minimal_inference.py`: load a checkpoint + charset, predict one image.

Works with this framework's msgpack checkpoints *and* the reference's
.pth checkpoints (imported on the fly).  ``--quantize`` runs the int8
serving path (the benchmark headline configuration).
"""

import sys

from rcnn_ocr_tpu.inference import OCRInference


def main():
    argv = [a for a in sys.argv[1:] if a != "--quantize"]
    quantize = "--quantize" in sys.argv[1:]
    model_path = argv[0] if len(argv) > 0 else "exp1/best_acc_weights.msgpack"
    charset_path = argv[1] if len(argv) > 1 else "configs/charset.txt"
    image_path = argv[2] if len(argv) > 2 else "test.png"

    ocr = OCRInference(model_path, charset_path, device="auto", quantize=quantize)
    text = ocr.predict(image_path)
    print(f"Result: '{text}'")


if __name__ == "__main__":
    main()
