"""Offline tools: DPT normals, image ops, lora preprocess, viewer, logging."""

import json
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np

from vegs_tpu.ops.image_ops import fused_leaky_relu, make_fir_kernel, upfirdn2d
from vegs_tpu.priors.dpt import DPTConfig, DPTNormal, init_dpt
from vegs_tpu.utils.logging import MetricsLogger, StepTimer


def test_dpt_forward_shapes():
    cfg = DPTConfig.tiny()
    params = init_dpt(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    n = DPTNormal(cfg).apply(params, x)
    assert n.shape == (1, 64, 64, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_normal_estimator_sliding(rng, tmp_path):
    from vegs_tpu.tools.estimate_normal import NormalEstimator

    est = NormalEstimator(DPTConfig.tiny())
    img = rng.uniform(0, 1, (64, 192, 3)).astype(np.float32)
    n = est.infer_sliding(img)
    assert n.shape == (64, 192, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)
    flipped = est.to_repo_convention(n)
    np.testing.assert_allclose(flipped[..., 2], n[..., 2])
    np.testing.assert_allclose(flipped[..., 0], -n[..., 0])


def test_upfirdn2d_identity_and_blur(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    ident = jnp.asarray([[1.0]])
    y = upfirdn2d(x, ident)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    # blur preserves mean
    k = make_fir_kernel([1, 3, 3, 1])
    y2 = upfirdn2d(x, k, pad=(1, 2))
    assert y2.shape == x.shape
    # upsample x2
    y3 = upfirdn2d(x, k * 4, up=2, pad=(2, 1))
    assert y3.shape == (1, 16, 16, 2)
    # leaky relu with gain
    z = fused_leaky_relu(jnp.asarray([-1.0, 2.0]), bias=jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(z), [-0.2 * np.sqrt(2), 2 * np.sqrt(2)], rtol=1e-6)


def test_lora_preprocess(tmp_path, rng):
    from PIL import Image

    from vegs_tpu.tools.lora_preprocess import preprocess_segment

    seq = "seq0"
    img_dir = tmp_path / "data_2d_raw" / seq / "image_00" / "data_rect"
    img_dir.mkdir(parents=True)
    for f in (5, 6):
        arr = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{f:010d}.png")
    out = preprocess_segment(tmp_path, seq, 5, 7, tmp_path / "lora_data",
                             n_images=4, size=32)
    files = sorted((tmp_path / "lora_data").glob("*.png"))
    assert len(files) == 4
    meta = [json.loads(l) for l in
            (tmp_path / "lora_data" / "metadata.jsonl").read_text().splitlines()]
    assert len(meta) == 4 and "suburban street" in meta[0]["text"]


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(tmp_path)
    lg.log({"loss": 1.0}, step=1)
    lg.log({"loss": 0.5}, step=2)
    lg.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["step"] == 2

    t = StepTimer()
    with t("phase"):
        pass
    assert "phase" in t.summary()


def test_viewer_roundtrip(rng):
    from vegs_tpu.viewer import ViewerServer

    srv = ViewerServer(port=0)
    port = srv.listener.getsockname()[1]
    h, w = 4, 6
    result = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        msg = json.dumps({
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "keep_alive": False, "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }).encode()
        c.sendall(len(msg).to_bytes(4, "little"))
        c.sendall(msg)
        img = b""
        while len(img) < h * w * 3:
            img += c.recv(4096)
        n = int.from_bytes(img[h * w * 3:h * w * 3 + 4] or c.recv(4), "little")
        result["image"] = img[:h * w * 3]
        c.close()

    th = threading.Thread(target=client)
    th.start()

    def render_fn(cam, scale):
        assert cam.image_width == w
        return np.full((h, w, 3), 0.5, np.float32)

    import time as _time

    cont = True
    for _ in range(200):  # non-blocking accept: poll until serviced
        cont = srv.poll(render_fn, source_path="src")
        if result:
            break
        _time.sleep(0.02)
    th.join(timeout=10)
    assert result, "viewer round-trip never completed"
    assert cont is True
    assert result["image"][0] == 127 or result["image"][0] == 128
    srv.close()


def test_viewer_sibr_wire_format(rng):
    """Byte-level scripted SIBR client (wire format of the reference's
    network_gui.py:34-86): a keep-alive empty-camera message, then a full
    camera packet with every field the real client sends (incl. the
    shs_python/rot_scale_python toggles we ignore), a NON-identity view
    matrix — asserting the server applies the y/z column sign flips — and
    framed image + length-prefixed verify-string reads."""
    from vegs_tpu.viewer import ViewerServer

    srv = ViewerServer(port=0)
    port = srv.listener.getsockname()[1]
    h, w = 5, 7
    seen = {}
    result = {}

    view = np.eye(4)
    view[3, :3] = [1.0, 2.0, 3.0]       # camera translation row (glm layout)
    view[:, 1] *= -1   # pre-flip so the server's column flips restore it
    view[:, 2] *= -1

    def send_msg(c, payload):
        msg = json.dumps(payload).encode()
        c.sendall(len(msg).to_bytes(4, "little"))
        c.sendall(msg)

    def recv_exact(c, n):
        buf = b""
        while len(buf) < n:
            chunk = c.recv(n - len(buf))
            assert chunk, "connection closed early"
            buf += chunk
        return buf

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        # 1) keep-alive: zero resolution -> no image, just the verify string
        send_msg(c, {"resolution_x": 0, "resolution_y": 0})
        n = int.from_bytes(recv_exact(c, 4), "little")
        result["verify0"] = recv_exact(c, n)
        # 2) full camera packet (all reference fields)
        send_msg(c, {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": False, "scaling_modifier": 1.5,
            "view_matrix": list(view.flatten().astype(float)),
            "view_projection_matrix": list(view.flatten().astype(float)),
        })
        result["image"] = recv_exact(c, h * w * 3)
        n = int.from_bytes(recv_exact(c, 4), "little")
        result["verify"] = recv_exact(c, n)
        c.close()

    th = threading.Thread(target=client)
    th.start()

    def render_fn(cam, scale):
        seen["cam"] = cam
        seen["scale"] = scale
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = 1.0
        return img

    import time as _time

    for _ in range(400):
        srv.poll(render_fn, source_path="model/path")
        if "verify" in result:
            break
        _time.sleep(0.02)
    th.join(timeout=10)
    assert result.get("verify0") == b"model/path"
    assert result.get("verify") == b"model/path"
    assert result["image"][:3] == b"\xff\x00\x00"  # red, row-major RGB
    assert seen["scale"] == 1.5
    cam = seen["cam"]
    # the server must flip columns 1 and 2 (glm -> our convention),
    # undoing the client-side pre-flip
    np.testing.assert_allclose(cam.world_view_transform[:3, :3], np.eye(3),
                               atol=1e-12)
    np.testing.assert_allclose(cam.world_view_transform[3, :3], [1, 2, 3])
    srv.close()


def test_lora_train_driver(tmp_path, rng):
    """Per-segment LoRA driver: segment parsing (reference txt format) and
    end-to-end tiny training writing the lora_weights.pkl layout train.main
    resolves."""
    import jax
    from PIL import Image

    from vegs_tpu.diffusion.pipeline import DiffusionModels
    from vegs_tpu.tools import lora_train

    seg_file = tmp_path / "segs.txt"
    seg_file.write_text(
        "lora/data/kitti360/2013_05_28_drive_0009_sync/"
        "0000003972_0000004258.tar\n")
    segs = lora_train.parse_segments_file(str(seg_file))
    assert segs == [("2013_05_28_drive_0009_sync",
                     "0000003972", "0000004258")]

    data_dir = tmp_path / "data" / "seqA" / "0_10"
    data_dir.mkdir(parents=True)
    for i in range(3):
        arr = (rng.uniform(0, 255, (32, 32, 3))).astype("uint8")
        Image.fromarray(arr).save(data_dir / f"{i}.png")

    models = DiffusionModels.tiny(jax.random.key(0), image_size=32,
                                  lora_rank=2)
    images = lora_train.load_segment_images(str(data_dir), size=32)
    assert images.shape == (3, 3, 32, 32)
    out_dir = tmp_path / "models" / "seqA" / "0_10"
    losses = lora_train.train_segment(
        models, images, str(out_dir), steps=2, seed=0, grad_accum=1)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    assert (out_dir / "lora_weights.pkl").exists()

    # the guidance loader accepts the directory
    from vegs_tpu.diffusion.lora import load_lora_weights

    p2 = load_lora_weights(models.unet_params, str(out_dir))
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(
        models.unet_params)
