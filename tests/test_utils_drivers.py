import json
from pathlib import Path

import numpy as np
import pytest

from nerf_kbs_tpu.utils import colormaps as cm


def test_turbo_and_depth_colormap():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    img = cm.apply_turbo(x)
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0 and img.max() <= 1
    # distinct colors at the extremes
    assert not np.allclose(img[0, 0], img[-1, -1])
    depth = np.linspace(1, 10, 64).reshape(8, 8, 1)
    acc = np.ones((8, 8, 1))
    panel = cm.apply_depth_colormap(depth, acc)
    assert panel.shape == (8, 8, 3)


def test_semantic_colormap_and_composite():
    colors = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    labels = np.array([[0, 1], [1, 0]])
    img = cm.apply_semantic_colormap(labels, colors)
    np.testing.assert_array_equal(img[0, 0], [1, 0, 0])
    np.testing.assert_array_equal(img[0, 1], [0, 1, 0])
    side = cm.side_by_side(np.zeros((4, 5, 3)), np.ones((4, 6, 3)))
    assert side.shape == (4, 11, 3)
    assert cm.to_uint8(np.array([[[2.0, -1.0, 0.5]]])).tolist() == [[[255, 0, 127]]]


def test_lpips_absent_returns_none(monkeypatch, tmp_path):
    monkeypatch.setenv("NKT_LPIPS_DIR", str(tmp_path))
    from nerf_kbs_tpu.utils.lpips import load_lpips

    assert load_lpips() is None


def test_profiling_utilities():
    import jax.numpy as jnp

    from nerf_kbs_tpu.utils.profiling import StepTimer, install_faulthandler

    install_faulthandler()
    t = StepTimer()
    x = jnp.ones((8,)) * 2
    t.tick(1024, sync_on=x)
    r = t.rates()
    assert r["rays_per_sec"] > 0 and r["steps_per_sec"] > 0


def test_create_transform_pipeline(tmp_path):
    from PIL import Image

    from nerf_kbs_tpu.process_data.create_transform import (
        ProcessImagesConfig,
        copy_and_downscale,
        main,
        split_frame_window,
    )
    from tests.test_metadata import write_text_model

    rng = np.random.default_rng(0)
    src = tmp_path / "raw"
    src.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
            src / f"img_{i}.png"
        )
    cfg = ProcessImagesConfig(data=str(src), output_dir=str(tmp_path / "proc"),
                              num_downscales=2)
    names = copy_and_downscale(cfg)
    assert len(names) == 6
    assert (tmp_path / "proc" / "images" / "frame_00000.png").exists()
    with Image.open(tmp_path / "proc" / "images_4" / "frame_00000.png") as im:
        assert im.size == (12, 8)

    # provide a pre-existing model ('variant' mode) and produce transforms.json
    write_text_model(tmp_path / "proc" / "colmap" / "sparse" / "0", n=6)
    out = main(ProcessImagesConfig(data=str(src), output_dir=str(tmp_path / "proc"),
                                   use_existing_model=str(tmp_path / "proc" / "colmap" / "sparse" / "0")))
    meta = json.loads(Path(out).read_text())
    assert len(meta["frames"]) == 6

    assert split_frame_window([f"{i}.png" for i in range(10)], 2, 5) == [
        "2.png", "3.png", "4.png"
    ]


def test_raft_flow_extraction_driver(tmp_path):
    from PIL import Image

    from nerf_kbs_tpu.process_data.raft_driver import FlowExtractConfig, extract_flows

    rng = np.random.default_rng(1)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)).save(
            d / f"{i:04}.png"
        )
    cfg = FlowExtractConfig(image_dir=str(d), output_dir=str(tmp_path / "motion"),
                            iters=1, width=40, height=32)
    res = extract_flows(cfg)
    assert res["pairs"] == 2
    f = np.load(tmp_path / "motion" / "flow_fwd" / "0000.npy")
    assert f.shape == (32, 40, 2)
    assert (tmp_path / "motion" / "flow_bwd" / "0001.npy").exists()
    assert (tmp_path / "motion" / "flow_viz" / "0000.png").exists()


def test_raft_train_step_decreases_loss(tmp_path):
    import jax.numpy as jnp

    from nerf_kbs_tpu.process_data.raft_driver import (
        RaftTrainConfig,
        make_raft_train_state,
        make_raft_train_step,
    )

    cfg = RaftTrainConfig(iters=1, lr=1e-4, num_steps=50)
    raft, variables, tx, opt_state = make_raft_train_state(cfg, 16, 16)
    step = make_raft_train_step(raft, tx, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32),
        "img2": jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32),
        "flow": jnp.zeros((2, 16, 16, 2)),
        "valid": jnp.ones((2, 16, 16)),
    }
    losses = []
    for _ in range(8):
        variables, opt_state, loss, metrics = step(variables, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def _tiny_viewer_trainer(tmp_path):
    import dataclasses

    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig
    from nerf_kbs_tpu.engine.trainer import Trainer, TrainerConfig
    from nerf_kbs_tpu.models import nerfacto

    from tests.test_models import TINY

    dm = SyntheticDataManager(num_cameras=4, h=16, w=16, rays_per_batch=64)
    cfg = dataclasses.replace(TINY, num_images=4)
    return Trainer(
        TrainerConfig(output_dir=str(tmp_path), eval_num_rays_per_chunk=256),
        nerfacto, cfg,
        {"proposal_networks": OptimizerConfig(), "fields": OptimizerConfig()},
        dm,
    )


def test_viewer_websocket(tmp_path):
    """RFC-6455 path: handshake accept key, initial status push, masked
    pose message -> binary PNG frame, ping -> pong, clean close echo."""
    import base64
    import json
    import socket
    import struct

    from nerf_kbs_tpu.engine.viewer import ViewerServer, ws_accept_key

    tr = _tiny_viewer_trainer(tmp_path)
    srv = ViewerServer(tr, eval_image_dir=str(tr.out_dir / "eval_images"), port=0)
    port = srv._server.server_address[1]
    srv.start_background()
    s = None
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=240)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall(
            (f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
             "Upgrade: websocket\r\nConnection: Upgrade\r\n"
             f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
             ).encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += s.recv(4096)
        head, leftover = resp.split(b"\r\n\r\n", 1)
        assert b" 101 " in head.split(b"\r\n")[0] + b" "
        assert ws_accept_key(key).encode() in head

        buf = bytearray(leftover)

        def read_exact(n):
            while len(buf) < n:
                chunk = s.recv(65536)
                assert chunk, "server closed mid-frame"
                buf.extend(chunk)
            out = bytes(buf[:n])
            del buf[:n]
            return out

        def recv_frame():  # server->client frames are unmasked
            hdr = read_exact(2)
            opcode, n = hdr[0] & 0x0F, hdr[1] & 0x7F
            assert not hdr[1] & 0x80
            if n == 126:
                n = struct.unpack(">H", read_exact(2))[0]
            elif n == 127:
                n = struct.unpack(">Q", read_exact(8))[0]
            return opcode, read_exact(n)

        def send_masked(payload, opcode=0x1):
            assert len(payload) < 126
            mask = b"\x01\x02\x03\x04"
            s.sendall(bytes([0x80 | opcode, 0x80 | len(payload)]) + mask
                      + bytes(c ^ mask[i & 3] for i, c in enumerate(payload)))

        op, payload = recv_frame()  # initial status push
        assert op == 0x1
        status = json.loads(payload)
        assert status["step"] == 0 and status["mode"] == "standalone"

        send_masked(json.dumps(
            {"type": "pose", "theta": 1.0, "size": 16}).encode())
        op, payload = recv_frame()
        assert op == 0x2 and payload[:4] == b"\x89PNG"

        send_masked(b"hi", opcode=0x9)
        op, payload = recv_frame()
        assert op == 0xA and payload == b"hi"

        # fragmented pose message: text start (FIN=0) + continuation (FIN=1)
        # must be reassembled and answered (RFC 6455 §5.4)
        pose = json.dumps({"type": "pose", "theta": 1.1, "size": 16}).encode()
        mask = b"\x01\x02\x03\x04"
        s.sendall(bytes([0x01, 0x80 | 7]) + mask
                  + bytes(c ^ mask[i & 3] for i, c in enumerate(pose[:7])))
        s.sendall(bytes([0x80, 0x80 | len(pose[7:])]) + mask
                  + bytes(c ^ mask[i & 3] for i, c in enumerate(pose[7:])))
        op, payload = recv_frame()
        assert op == 0x2 and payload[:4] == b"\x89PNG"

        send_masked(struct.pack(">H", 1000), opcode=0x8)
        op, payload = recv_frame()
        assert op == 0x8 and payload == struct.pack(">H", 1000)
    finally:
        if s is not None:
            s.close()
        srv.shutdown()


def test_ws_recv_frame_rejects_oversized():
    """A client frame claiming a payload beyond WS_MAX_FRAME must end the
    session (return None) WITHOUT buffering the payload — inbound traffic
    is small JSON, so a huge length is a hostile or desynced peer."""
    import struct

    from nerf_kbs_tpu.engine.viewer import WS_MAX_FRAME, ws_recv_frame

    class Stub:
        def __init__(self, data):
            self.data = data

        def recv(self, n):
            out, self.data = self.data[:n], self.data[n:]
            return out

    # masked binary frame header claiming a 1 TiB payload, then 1 KiB of it
    hdr = bytes([0x82, 0x80 | 127]) + struct.pack(">Q", 1 << 40) + b"\x00" * 4
    stub = Stub(hdr + b"x" * 1024)
    assert ws_recv_frame(stub) is None
    # rejection happens straight after the length field: the 4 mask bytes
    # and the payload are left unread, nothing was buffered
    assert len(stub.data) == 4 + 1024

    # a frame at exactly the cap still goes through (unmasked text)
    ok = Stub(bytes([0x81, 127]) + struct.pack(">Q", WS_MAX_FRAME)
              + b"a" * WS_MAX_FRAME)
    op, payload, fin = ws_recv_frame(ok)
    assert op == 0x1 and len(payload) == WS_MAX_FRAME and fin


def test_viewer_websocket_pipelined_upgrade(tmp_path):
    """A scripted client that pipelines its first masked frame in the SAME
    TCP segment as the upgrade request must still get an answer: the
    handler's BufferedReader consumes those bytes while reading headers,
    and the WS session has to drain them (viewer._BufferedSocket)."""
    import base64
    import json
    import socket
    import struct

    from nerf_kbs_tpu.engine.viewer import ViewerServer

    tr = _tiny_viewer_trainer(tmp_path)
    srv = ViewerServer(tr, eval_image_dir=str(tr.out_dir / "eval_images"), port=0)
    port = srv._server.server_address[1]
    srv.start_background()
    s = None
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=240)
        key = base64.b64encode(b"0123456789abcdef").decode()
        pose = json.dumps({"type": "pose", "theta": 0.5, "size": 16}).encode()
        mask = b"\x05\x06\x07\x08"
        frame = (bytes([0x81, 0x80 | len(pose)]) + mask
                 + bytes(c ^ mask[i & 3] for i, c in enumerate(pose)))
        s.sendall(
            (f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
             "Upgrade: websocket\r\nConnection: Upgrade\r\n"
             f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
             ).encode() + frame)
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += s.recv(4096)
        _head, leftover = resp.split(b"\r\n\r\n", 1)
        buf = bytearray(leftover)

        def read_exact(n):
            while len(buf) < n:
                chunk = s.recv(65536)
                assert chunk, "server closed mid-frame"
                buf.extend(chunk)
            out = bytes(buf[:n])
            del buf[:n]
            return out

        def recv_frame():
            hdr = read_exact(2)
            opcode, n = hdr[0] & 0x0F, hdr[1] & 0x7F
            if n == 126:
                n = struct.unpack(">H", read_exact(2))[0]
            elif n == 127:
                n = struct.unpack(">Q", read_exact(8))[0]
            return opcode, read_exact(n)

        op, _ = recv_frame()  # initial status push
        assert op == 0x1
        op, payload = recv_frame()  # answer to the pipelined pose
        assert op == 0x2 and payload[:4] == b"\x89PNG"
    finally:
        if s is not None:
            s.close()
        srv.shutdown()


def test_viewer_server_endpoints(tmp_path):
    """Viewer stand-in: /status, /render, /orbit against a tiny trainer."""
    import json
    import urllib.request

    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig
    from nerf_kbs_tpu.engine.trainer import Trainer, TrainerConfig
    from nerf_kbs_tpu.engine.viewer import ViewerServer
    from nerf_kbs_tpu.models import nerfacto

    import dataclasses

    from tests.test_models import TINY

    dm = SyntheticDataManager(num_cameras=4, h=16, w=16, rays_per_batch=64)
    cfg = dataclasses.replace(TINY, num_images=4)
    tr = Trainer(
        TrainerConfig(output_dir=str(tmp_path), eval_num_rays_per_chunk=256),
        nerfacto, cfg,
        {"proposal_networks": OptimizerConfig(), "fields": OptimizerConfig()},
        dm,
    )
    srv = ViewerServer(tr, eval_image_dir=str(tr.out_dir / "eval_images"), port=0)
    port = srv._server.server_address[1]
    srv.start_background()
    try:
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/status", timeout=30).read())
        assert st["mode"] == "standalone" and st["num_eval_images"] == 2
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?cam=0&kind=rgb", timeout=120).read()
        assert png[:4] == b"\x89PNG"
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/orbit?theta=1.0&size=16", timeout=120).read()
        assert png[:4] == b"\x89PNG"
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"viewer" in html
    finally:
        srv.shutdown()


def test_tensorboard_writer_roundtrip(tmp_path):
    """The dependency-free event writer (utils/tboard.py, reference
    vis='tensorboard' train.py:100) must produce files the REAL
    tensorboard reader parses: scalars come back with exact steps/tags
    and float32-rounded values, and the TFRecord CRCs must be the ones
    tensorboard's own crc32c computes."""
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )

    from nerf_kbs_tpu.utils.tboard import TensorboardWriter

    w = TensorboardWriter(tmp_path)
    w.add_scalars(1, {"psnr": 21.5, "total_loss": 0.25, "step": 1})
    w.add_scalars(50, {"psnr": 30.125, "note": "not-a-float"})
    w.close()

    ea = ea_mod.EventAccumulator(str(tmp_path))
    ea.Reload()
    assert sorted(ea.Tags()["scalars"]) == ["psnr", "total_loss"]
    psnr = ea.Scalars("psnr")
    assert [(e.step, e.value) for e in psnr] == [(1, 21.5), (50, 30.125)]
    assert ea.Scalars("total_loss")[0].value == 0.25

    # CRC parity with tensorboard's own implementation on the raw records
    import struct

    from tensorboard.compat.tensorflow_stub.pywrap_tensorflow import (
        masked_crc32c,
    )

    from nerf_kbs_tpu.utils.tboard import _masked_crc

    raw = next(tmp_path.glob("events.out.tfevents.*")).read_bytes()
    off = 0
    n_records = 0
    while off < len(raw):
        (ln,) = struct.unpack("<Q", raw[off : off + 8])
        (len_crc,) = struct.unpack("<I", raw[off + 8 : off + 12])
        data = raw[off + 12 : off + 12 + ln]
        (data_crc,) = struct.unpack("<I", raw[off + 12 + ln : off + 16 + ln])
        assert len_crc == _masked_crc(raw[off : off + 8])
        assert len_crc == masked_crc32c(raw[off : off + 8])
        assert data_crc == masked_crc32c(data)
        off += 16 + ln
        n_records += 1
    assert n_records == 3  # file_version + 2 scalar events
