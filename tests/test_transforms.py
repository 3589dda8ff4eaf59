import numpy as np
import pytest

from rcnn_ocr_tpu.data.transforms import (
    ResizeAndPad,
    build_file_index,
    get_train_transform,
    get_val_transform,
    imread_cv2,
    normalize_unit,
    random_brightness_contrast,
    shift_scale_rotate,
)


def _img(h, w, value=128):
    return np.full((h, w, 3), value, dtype=np.uint8)


def test_resize_and_pad_geometry():
    rp = ResizeAndPad(img_h=32, img_w=128)
    # a 16x32 image scales x2 -> 32x64, pasted at left, white pad on right
    img = _img(16, 32, 10)
    out = rp(img)
    assert out.shape == (32, 128, 3)
    assert (out[:, :64] == 10).all()
    assert (out[:, 64:] == 255).all()


def test_resize_and_pad_vertical_center():
    rp = ResizeAndPad(img_h=32, img_w=128)
    # a 16x64 image scales x2 -> 32x128 exactly: no padding at all
    out = rp(_img(16, 64, 7))
    assert (out == 7).all()
    # a very wide image: scale limited by width -> vertical centering
    out = rp(_img(32, 512, 9))  # scale 0.25 -> 8x128
    assert (out[:12] == 255).all() and (out[20:] == 255).all()
    assert (out[12:20] == 9).all()


def test_resize_and_pad_gray_and_rgba():
    rp = ResizeAndPad(img_h=8, img_w=8)
    assert rp(np.zeros((4, 4), np.uint8)).shape == (8, 8, 3)
    assert rp(np.zeros((4, 4, 4), np.uint8)).shape == (8, 8, 3)


def test_resize_and_pad_min_one_pixel():
    rp = ResizeAndPad(img_h=32, img_w=32)
    out = rp(_img(1, 2000, 3))  # extreme aspect: new_h rounds to >= 1
    assert out.shape == (32, 32, 3)


def test_normalize_unit_range():
    out = normalize_unit(_img(4, 4, 255))
    np.testing.assert_allclose(out, 1.0)
    out = normalize_unit(_img(4, 4, 0))
    np.testing.assert_allclose(out, -1.0)
    # white padding maps to +1.0 exactly — the model was trained on that
    assert normalize_unit(_img(1, 1, 255))[0, 0, 0] == 1.0


def test_val_transform_output():
    t = get_val_transform(32, 64)
    out = t(_img(16, 16, 128))
    assert out.shape == (32, 64, 3)
    assert out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_train_transform_deterministic_given_rng():
    t = get_train_transform({"p_ShiftScaleRotate": 1.0, "p_BrightnessContrast": 1.0}, 32, 64)
    img = np.random.default_rng(0).integers(0, 255, (20, 40, 3)).astype(np.uint8)
    a = t(img, np.random.default_rng(5))
    b = t(img, np.random.default_rng(5))
    c = t(img, np.random.default_rng(6))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (32, 64, 3)


def test_shift_scale_rotate_white_border():
    img = _img(20, 40, 0)
    out = shift_scale_rotate(img, np.random.default_rng(0), 0.3, 0.0, 0.0)
    # large shift exposes the white constant border somewhere
    assert (out == 255).any()


def test_brightness_contrast_identity_at_zero():
    img = _img(4, 4, 100)
    out = random_brightness_contrast(img, np.random.default_rng(0), 0.0, 0.0)
    np.testing.assert_array_equal(out, img)


def test_build_file_index_and_imread(tmp_path):
    import cv2

    d = tmp_path / "imgs" / "sub"
    d.mkdir(parents=True)
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 2] = 200  # red channel in RGB terms after conversion
    cv2.imwrite(str(d / "A.png"), img)
    (d / "notes.txt").write_text("x")
    idx = build_file_index(str(tmp_path))
    assert "a.png" in idx and len(idx["a.png"]) == 1
    assert "notes.txt" not in idx
    loaded = imread_cv2(idx["a.png"][0])
    assert loaded.shape == (4, 4, 3)
    # BGR file -> RGB output: the blue-file channel appears in channel 0
    assert loaded[0, 0, 0] == 200 or loaded[0, 0, 2] == 200


def test_imread_missing_raises(tmp_path):
    with pytest.raises(Exception):
        imread_cv2(str(tmp_path / "missing.png"))


def test_image_size_exif_rotated_jpeg(tmp_path):
    """cv2 auto-applies EXIF orientation at decode; the header probe must
    report the DECODED orientation or bucketing / canvas='auto' see an
    inverted aspect (round-4 review, verified against cv2 5.0)."""
    import cv2

    from rcnn_ocr_tpu.data.transforms import image_size, imread_cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 211, 3)).astype(np.uint8)
    plain = str(tmp_path / "plain.jpg")
    cv2.imwrite(plain, img)
    assert image_size(plain) == imread_cv2(plain).shape[:2]

    # splice an EXIF APP1 with orientation=6 (90-degree rotation) into
    # the JPEG stream right after SOI
    exif = (
        b"Exif\x00\x00"
        + b"II*\x00\x08\x00\x00\x00"          # TIFF little-endian, IFD at 8
        + b"\x01\x00"                           # one entry
        + b"\x12\x01\x03\x00\x01\x00\x00\x00\x06\x00\x00\x00"  # 0x0112=6
        + b"\x00\x00\x00\x00"                   # next IFD = none
    )
    app1 = b"\xff\xe1" + (len(exif) + 2).to_bytes(2, "big") + exif
    raw = open(plain, "rb").read()
    rotated = str(tmp_path / "rotated.jpg")
    open(rotated, "wb").write(raw[:2] + app1 + raw[2:])

    decoded = imread_cv2(rotated)
    probed = image_size(rotated)
    assert probed == decoded.shape[:2], (probed, decoded.shape)


def test_image_size_os2_core_header_bmp(tmp_path):
    """A 12-byte OS/2 BITMAPCOREHEADER stores int16 width/height at
    offsets 18/20 — parsing it with the 40-byte-header offsets yields
    multi-million-pixel nonsense (round-4 review)."""
    from rcnn_ocr_tpu.data.transforms import image_size

    w, h, bpp = 100, 50, 24
    row = (w * 3 + 3) & ~3
    pixel_bytes = row * h
    header = (
        b"BM"
        + (26 + pixel_bytes).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (26).to_bytes(4, "little")          # pixel data offset
        + (12).to_bytes(4, "little")          # BITMAPCOREHEADER size
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
    )
    path = str(tmp_path / "core.bmp")
    open(path, "wb").write(header + b"\x7f" * pixel_bytes)
    assert image_size(path) == (h, w)


def test_load_rgb_uint8_hxwx1_grayscale():
    """HxWx1 grayscale (np.expand_dims output) must canonicalize to RGB
    like HxW does — it used to pass through and crash ResizeAndPad."""
    from rcnn_ocr_tpu.data.transforms import ResizeAndPad, load_rgb_uint8

    g = np.full((20, 40, 1), 128, np.uint8)
    rgb = load_rgb_uint8(g)
    assert rgb.shape == (20, 40, 3)
    out = ResizeAndPad(img_h=32, img_w=128)(rgb)
    assert out.shape == (32, 128, 3)
    # float HxWx1 follows the same path
    assert load_rgb_uint8(g.astype(np.float32)).shape == (20, 40, 3)


def test_random_edge_crop():
    from rcnn_ocr_tpu.data.transforms import random_edge_crop

    img = np.arange(64 * 200 * 3, dtype=np.uint8).reshape(64, 200, 3)
    rng = np.random.default_rng(0)
    out = random_edge_crop(img, rng, limit=0.35)
    # crops a strip off exactly one side, height untouched
    assert out.shape[0] == 64 and out.shape[2] == 3
    assert 200 - int(0.35 * 64) - 1 <= out.shape[1] < 200
    lost = 200 - out.shape[1]
    left = np.array_equal(out, img[:, lost:])
    right = np.array_equal(out, img[:, : 200 - lost])
    assert left or right
    # degenerate: a narrow image is returned unchanged (crop >= w/4)
    tiny = np.zeros((64, 20, 3), np.uint8)
    assert random_edge_crop(tiny, np.random.default_rng(1)).shape == (64, 20, 3)


def test_train_transform_edge_crop_key():
    """p_EdgeCrop=1 changes the pre-resize geometry (content shifts);
    p_EdgeCrop=0 (the default, reference parity) leaves the pipeline
    byte-identical to the no-key transform."""
    t_off = get_train_transform({"p_ShiftScaleRotate": 0.0,
                                 "p_BrightnessContrast": 0.0}, 32, 64)
    t_off2 = get_train_transform({"p_ShiftScaleRotate": 0.0,
                                  "p_BrightnessContrast": 0.0,
                                  "p_EdgeCrop": 0.0}, 32, 64)
    t_on = get_train_transform({"p_ShiftScaleRotate": 0.0,
                                "p_BrightnessContrast": 0.0,
                                "p_EdgeCrop": 1.0}, 32, 64)
    img = np.zeros((32, 64, 3), np.uint8)
    img[:, ::7] = 255  # vertical stripes: any crop shifts the phase
    a = t_off(img, np.random.default_rng(3))
    b = t_off2(img, np.random.default_rng(3))
    c = t_on(img, np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_edge_crop_refused_with_device_augment(tmp_path):
    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    cfg = Config({
        "exp_dir": str(tmp_path / "exp"),
        "train_csvs": [str(tmp_path / "nope.csv")],
        "train_roots": [str(tmp_path)],
        "charset_path": str(tmp_path / "cs.txt"),
        "device_augment": True,
        "p_EdgeCrop": 0.2,
    })
    with pytest.raises(ValueError, match="p_EdgeCrop"):
        run_training(cfg)
