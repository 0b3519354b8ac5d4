"""Persistent codec server round trip (VERDICT r4 item 2): a real
subprocess server on a unix socket, driven through the forwarding client
path the CLI uses."""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from tests.conftest import make_test_image


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("srv") / "jxl.sock")
    env = dict(os.environ, JXL_TPU_PLATFORM="cpu", JXL_TPU_SOCKET=sock)
    env.pop("JXL_TPU_NO_SERVER", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "jxl_tpu", "serve"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(sock):
        if proc.poll() is not None:
            pytest.fail("server exited early")
        time.sleep(0.5)
    assert os.path.exists(sock), "server socket never appeared"
    yield sock
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock)
        f = c.makefile("rwb")
        f.write((json.dumps({"cmd": "shutdown"}) + "\n").encode())
        f.flush()
        f.readline()
    except OSError:
        proc.kill()
    proc.wait(timeout=30)


def test_server_ping(server):
    from jxl_tpu.cli.server import try_forward

    rep = try_forward({"cmd": "ping"}, socket_path=server)
    assert rep == {"ok": True, "msg": "pong"}


def test_server_encode_decode_roundtrip(server, tmp_path):
    from jxl_tpu.cli.server import try_forward
    from jxl_tpu.core.io import write_image

    img = make_test_image(48, 64, seed=21)
    src = str(tmp_path / "in.png")
    jxt = str(tmp_path / "out.jxt")
    back = str(tmp_path / "back.png")
    write_image(src, img)

    rep = try_forward(
        {"cmd": "encode", "input": src, "output": jxt, "distance": 2.0,
         "effort": 3},
        socket_path=server,
    )
    assert rep and rep["ok"], rep
    assert os.path.getsize(jxt) > 0

    rep = try_forward(
        {"cmd": "decode", "input": jxt, "output": back}, socket_path=server
    )
    assert rep and rep["ok"], rep
    from PIL import Image

    out = np.asarray(Image.open(back).convert("RGB"))
    mse = np.mean((out.astype(np.float64) - img.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 28.0


def test_server_error_is_clean(server):
    from jxl_tpu.cli.server import try_forward

    rep = try_forward(
        {"cmd": "decode", "input": "/nonexistent.jxt", "output": "/tmp/x.png"},
        socket_path=server,
    )
    assert rep is not None and not rep["ok"]
    assert "error" in rep


def test_no_server_returns_none(tmp_path):
    from jxl_tpu.cli.server import try_forward

    assert try_forward({"cmd": "ping"}, socket_path=str(tmp_path / "no.sock")) is None
    os.environ["JXL_TPU_NO_SERVER"] = "1"
    try:
        assert try_forward({"cmd": "ping"}, socket_path="/tmp") is None
    finally:
        del os.environ["JXL_TPU_NO_SERVER"]


def test_server_survives_client_disconnect(server):
    """A client that connects and vanishes (or stays silent) must not
    kill or wedge the accept loop."""
    from jxl_tpu.cli.server import try_forward

    # connect and drop immediately (write nothing)
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(server)
    c.close()
    # connect, send garbage without newline, drop
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(server)
    c.sendall(b'{"cmd": "enc')
    c.close()
    rep = try_forward({"cmd": "ping"}, socket_path=server)
    assert rep == {"ok": True, "msg": "pong"}


def test_codec_env_knobs_disable_forwarding(server, monkeypatch):
    """A client steering the codec via JXL_TPU_* env must run locally (the
    server's environment would otherwise govern the encode)."""
    from jxl_tpu.cli.server import try_forward

    monkeypatch.setenv("JXL_TPU_MODULAR", "0")
    assert try_forward({"cmd": "ping"}, socket_path=server) is None
    monkeypatch.delenv("JXL_TPU_MODULAR")
    monkeypatch.setenv("JXL_TPU_PLATFORM", "cpu")  # non-codec knob: forwards
    assert try_forward({"cmd": "ping"}, socket_path=server)["ok"]
