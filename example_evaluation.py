"""Example of evaluating a model on a dataset (mirror of the reference's
`example_evaluation.py`) — edit the paths below or pass them as argv."""

import os
import sys

from evaluate_dataset import evaluate_model


def main():
    model_path = sys.argv[1] if len(sys.argv) > 1 else "exp1/best_acc_weights.msgpack"
    charset_path = sys.argv[2] if len(sys.argv) > 2 else "configs/charset.txt"
    csv_path = sys.argv[3] if len(sys.argv) > 3 else "data/val/labels.csv"
    root_path = sys.argv[4] if len(sys.argv) > 4 else "data/val"

    img_h, img_w = 64, 256

    print("Example: dataset evaluation")
    print(f"Image size: {img_h}x{img_w}")
    for path, name in [
        (model_path, "model"),
        (charset_path, "charset"),
        (csv_path, "CSV"),
        (root_path, "images folder"),
    ]:
        if not os.path.exists(path):
            print(f"{name} not found: {path}")
            return

    try:
        evaluate_model(
            model_path=model_path,
            charset_path=charset_path,
            csv_path=csv_path,
            root_path=root_path,
            batch_size=16,
            img_h=img_h,
            img_w=img_w,
        )
    except Exception as e:
        print(f"Error: {e}")


if __name__ == "__main__":
    main()
