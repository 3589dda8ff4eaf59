"""Dataset visualizer — mirror of the reference's `visualize_dataset.py`.

Builds the augmented dataset, pulls one batch, and renders a matplotlib
grid of denormalized images with the token-id strings of ``text_in`` /
``target_y``.

    python visualize_dataset.py <labels.csv> <images_root> [charset.txt] [out.png]

The figure is always SAVED (default ``dataset_preview.png``) — unlike the
reference script's ``plt.show()``, this targets headless TPU hosts, so the
Agg backend is unconditional and no window is ever opened.
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from rcnn_ocr_tpu.data.dataset import OCRDataset, ShuffleBatchSampler
from rcnn_ocr_tpu.data.loader import DataLoader
from rcnn_ocr_tpu.data.transforms import get_train_transform
from rcnn_ocr_tpu.vocab.charset import Charset


def ids_to_tokens_str(ids_row, itos):
    return " ".join(
        itos[int(t)] if 0 <= int(t) < len(itos) else f"<UNK:{int(t)}>" for t in ids_row
    )


def main():
    train_csv = sys.argv[1] if len(sys.argv) > 1 else "data/train/labels.csv"
    train_dir = sys.argv[2] if len(sys.argv) > 2 else "data/train"
    charset_path = sys.argv[3] if len(sys.argv) > 3 else "configs/charset.txt"
    out_path = sys.argv[4] if len(sys.argv) > 4 else "dataset_preview.png"

    img_height, img_max_width, max_len = 32, 256, 10
    charset = Charset.from_file(charset_path)

    transform = get_train_transform(
        {
            "shift_limit": 0.03,
            "scale_limit": 0.05,
            "rotate_limit": 5,
            "p_ShiftScaleRotate": 0.5,
            "brightness_limit": 0.2,
            "contrast_limit": 0.2,
            "p_BrightnessContrast": 0.5,
            "invert_p": 0.05,
        },
        img_h=img_height,
        img_w=img_max_width,
    )

    ds = OCRDataset(
        train_csv,
        train_dir,
        charset.stoi,
        img_height=img_height,
        img_max_width=img_max_width,
        transform=transform,
    )
    loader = DataLoader(
        ds, ShuffleBatchSampler(ds, 4, seed=0), charset, max_len, num_workers=2
    )
    batch = next(iter(loader))
    imgs, text_in, target_y, lengths = (
        batch["image"],
        batch["text_in"],
        batch["target_y"],
        batch["lengths"],
    )
    n = imgs.shape[0]
    itos = list(charset.itos)

    plt.figure(figsize=(14, 6))
    for i in range(n):
        img = (imgs[i] * 0.5 + 0.5).clip(0, 1)  # denormalize NHWC
        plt.subplot(2, n, i + 1)
        plt.imshow(img)
        plt.axis("off")
        plt.title(f"len={int(lengths[i])}")

        plt.subplot(2, n, n + i + 1)
        plt.text(
            0.0, 0.8, f"text_in:\n{ids_to_tokens_str(text_in[i], itos)}",
            fontsize=9, va="top", family="monospace",
        )
        plt.text(
            0.0, 0.3, f"target_y:\n{ids_to_tokens_str(target_y[i], itos)}",
            fontsize=9, va="top", family="monospace",
        )
        plt.axis("off")

    plt.tight_layout()
    plt.savefig(out_path, dpi=120)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
