"""Train entry point: ``python example_train.py [config.json]``.

Equivalent of the reference's `example_train.py` — loads the JSON config
and runs the full training loop on the available TPU devices.
"""

import sys

from rcnn_ocr_tpu.training.config import Config
from rcnn_ocr_tpu.training.train import run_training

if __name__ == "__main__":
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/config.json"
    cfg = Config(config_path)
    run_training(cfg)
