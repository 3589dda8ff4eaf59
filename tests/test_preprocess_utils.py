import numpy as np
import pytest

from rcnn_ocr_tpu.data.transforms import ResizeAndPad, normalize_unit
from rcnn_ocr_tpu.ops.preprocess import host_letterbox, resize_pad_normalize


def test_host_letterbox():
    imgs = [np.full((10, 20, 3), 5, np.uint8), np.full((30, 10, 3), 7, np.uint8)]
    canvas, sizes = host_letterbox(imgs, 32, 64)
    assert canvas.shape == (2, 32, 64, 3)
    assert sizes.tolist() == [[10, 20], [30, 10]]
    assert (canvas[0, :10, :20] == 5).all()
    assert (canvas[0, 10:, :] == 0).all()


def test_resize_pad_normalize_matches_host_geometry():
    """Device preprocess must agree with the host ResizeAndPad on geometry:
    white padding where the host pads, content where the host has content."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
    canvas, sizes = host_letterbox([img], 64, 128)
    out = np.asarray(resize_pad_normalize(jnp.asarray(canvas), jnp.asarray(sizes), 32, 128))
    assert out.shape == (1, 32, 128, 3)

    host = normalize_unit(ResizeAndPad(32, 128)(img))
    # both scale 16x32 -> 32x64: left half content, right half white (+1.0)
    np.testing.assert_allclose(out[0, :, 64:], 1.0, atol=1e-6)
    np.testing.assert_allclose(host[:, 64:], 1.0, atol=1e-6)
    # content regions correlate strongly (different resamplers, same image)
    a = out[0, :, :64].ravel()
    b = host[:, :64].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98
    # value range
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_resize_pad_normalize_vertical_centering():
    import jax.numpy as jnp

    img = np.zeros((8, 128, 3), np.uint8)  # wide: scale by width -> 8 rows tall at w=128
    canvas, sizes = host_letterbox([img], 32, 128)
    out = np.asarray(resize_pad_normalize(jnp.asarray(canvas), jnp.asarray(sizes), 32, 128))
    # content (black = -1) vertically centered rows 12..20
    assert (out[0, :12] > 0.99).all()
    assert (out[0, 20:] > 0.99).all()
    assert (out[0, 12:20] < -0.9).all()


def test_step_timer():
    import time

    from rcnn_ocr_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    for _ in range(6):
        t.start()
        time.sleep(0.002)
        t.stop(n_images=8)
    s = t.summary()
    assert s["steps"] == 4  # window
    assert s["mean_ms"] >= 2.0
    assert s["images_per_sec"] > 0


def test_load_model_util(tmp_path):
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state
    from rcnn_ocr_tpu.utils import load_model
    from rcnn_ocr_tpu.vocab.charset import Charset

    tokens = ["<PAD>", "<SOS>", "<EOS>"] + list("abc")
    cs = Charset.from_tokens(tokens)
    model = RCNN(num_classes=len(tokens), hidden_size=8, width_mult=0.0625,
                 lstm_layers=1, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)),
                   text=jnp.zeros((1, 3), jnp.int32), batch_max_length=2,
                   method=model.init_all)
    state = create_train_state(model, v, build_optimizer("Adam", 1e-3))
    path = str(tmp_path / "full_ckpt.msgpack")
    ckpt_io.save_checkpoint(path, state, None, 1, 1, 0.0, 0.0, list(cs.itos),
                            cs.stoi, {"hidden_size": 8}, "logs")

    # charset comes from the embedded itos; arch derived from params
    loaded_model, variables, charset = load_model(path)
    assert loaded_model.hidden_size == 8
    assert loaded_model.lstm_layers == 1
    assert charset.num_classes == len(tokens)


def test_area_resize_matches_host_cv2():
    """method="area" (exact box-coverage matmuls) tracks cv2 INTER_AREA ~25x
    closer than the triangle-kernel path — the serving/train parity fix."""
    import jax.numpy as jnp
    import numpy as np

    from rcnn_ocr_tpu.data.transforms import ResizeAndPad
    from rcnn_ocr_tpu.ops.preprocess import host_letterbox, resize_pad_normalize

    rng = np.random.default_rng(0)
    ih, iw = 32, 64
    rp = ResizeAndPad(img_h=ih, img_w=iw)
    imgs = [
        rng.integers(0, 256, size=(rng.integers(20, 60), rng.integers(40, 160), 3),
                     dtype=np.uint8)
        for _ in range(8)
    ]
    # include growing images too: both interpolation regimes must match
    imgs += [
        rng.integers(0, 256, size=(rng.integers(12, 24), rng.integers(20, 50), 3),
                     dtype=np.uint8)
        for _ in range(8)
    ]
    host = np.stack([(rp(im).astype(np.float32) / 255.0 - 0.5) / 0.5 for im in imgs])
    raw, sizes = host_letterbox(imgs, 60, 160)
    from rcnn_ocr_tpu.ops.preprocess import host_resize_geometry

    sizes5 = np.concatenate([sizes, host_resize_geometry(sizes, ih, iw)], axis=1)
    dev = np.asarray(
        resize_pad_normalize(jnp.asarray(raw), jnp.asarray(sizes5), ih, iw,
                             method="area")
    )
    d = np.abs(dev - host)
    # every pixel within one uint8 quantization step of the cv2 pipeline
    assert (d <= 1.0 / 255.0 / 0.5 + 1e-6).all(), d.max()

    # the [B, 2] in-kernel-geometry fallback stays available and close
    dev2 = np.asarray(
        resize_pad_normalize(jnp.asarray(raw), jnp.asarray(sizes), ih, iw,
                             method="area")
    )
    assert np.abs(dev2 - host).mean() < 0.01

    # unknown methods must raise, not silently fall back to linear
    import pytest

    with pytest.raises(ValueError, match="method"):
        resize_pad_normalize(jnp.asarray(raw), jnp.asarray(sizes), ih, iw,
                             method="aera")


def test_host_geometry_matches_resize_and_pad_half_boundary():
    """float32 in-kernel geometry rounds 11x88 -> (32,100) to a 12-row rect
    while the host's float64 gives 13 — host_resize_geometry must agree
    with ResizeAndPad on exactly these half-boundary sizes."""
    import numpy as np

    from rcnn_ocr_tpu.data.transforms import ResizeAndPad
    from rcnn_ocr_tpu.ops.preprocess import host_resize_geometry

    ih, iw = 32, 100
    cases = [(11, 88), (22, 176), (3, 24), (17, 300), (40, 100), (1, 1)]
    geom = host_resize_geometry(np.array(cases, np.int32), ih, iw)
    for (h, w), (dst_h, dst_w, y0) in zip(cases, geom):
        rp = ResizeAndPad(img_h=ih, img_w=iw)
        out = rp(np.zeros((h, w, 3), np.uint8))  # black on white canvas
        rows = np.where((out[:, :, 0] == 0).any(axis=1))[0]
        cols = np.where((out[:, :, 0] == 0).any(axis=0))[0]
        assert (rows[0], rows[-1] + 1 - rows[0]) == (y0, dst_h), (h, w)
        assert cols[-1] + 1 - cols[0] == dst_w, (h, w)


def test_device_normalize_bit_identical_to_host():
    """uint8-shipped batches normalize on device to the exact bytes the
    host float pipeline produces (VERDICT r2 #4: uint8 validation path)."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.augment import device_normalize

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, 8, 12, 3), dtype=np.uint8)
    host = normalize_unit(u8)
    dev = np.asarray(device_normalize(jnp.asarray(u8)))
    assert dev.dtype == np.float32
    assert np.array_equal(host, dev)
    # float inputs pass through untouched (host-normalized callers keep working)
    again = np.asarray(device_normalize(jnp.asarray(host)))
    assert np.array_equal(again, host)


def test_enable_compile_cache_writes_entries(tmp_path):
    """enable_compile_cache persists compiled executables to disk (the
    serving cold-start fix — tools/compile_cache_probe.py measured 3 s
    warm vs 199-335 s cold through the remote-compile tunnel)."""
    import os

    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.utils import enable_compile_cache

    cache_dir = str(tmp_path / "xla_cache")
    enable_compile_cache(cache_dir)
    try:
        fn = jax.jit(lambda x: jnp.tanh(x) * 3.0 - jnp.sin(x))
        fn(jnp.arange(16, dtype=jnp.float32)).block_until_ready()
        n_files = sum(len(fs) for _, _, fs in os.walk(cache_dir))
        assert n_files >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
