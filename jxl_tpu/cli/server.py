"""Persistent codec server — the fix for minutes-per-invocation CLI calls
(VERDICT r4 item 2 / weak 1).

On the tunneled TPU a fresh Python process pays tens of seconds to
minutes of fixed cost per invocation (backend/tunnel session acquisition
+ jit program loads) before any pixels move — the reference's
`cjxl`/`djxl` equivalents are cheap subprocesses, so its harness
semantics assume per-invocation execution is cheap
(`docker_manager.rs:100-136`). The server keeps ONE process (and its
compiled programs, fetch-window history and tunnel session) alive behind
a unix socket; subsequent `python -m jxl_tpu encode/decode` invocations
auto-forward when the socket exists, paying only a light no-JAX client
process + the actual codec work.

  python -m jxl_tpu serve [--socket /tmp/jxl_tpu.sock] &
  python -m jxl_tpu encode in.png out.jxt --distance 1.0   # forwarded
  JXL_TPU_NO_SERVER=1 python -m jxl_tpu encode ...          # force local

Protocol: one JSON request line per connection
  {"cmd": "encode"|"decode"|"ping"|"shutdown", ...}
reply: {"ok": true, "msg": "..."} | {"ok": false, "error": "..."}.
Paths are resolved server-side — client and server share a filesystem.
"""

from __future__ import annotations

import json
import os
import socket
import sys

DEFAULT_SOCKET = os.environ.get("JXL_TPU_SOCKET", "/tmp/jxl_tpu.sock")


def _handle(req: dict) -> dict:
    cmd = req.get("cmd")
    if cmd == "ping":
        return {"ok": True, "msg": "pong"}
    if cmd == "encode":
        import time

        from jxl_tpu.codec.config import CodecConfig, Strategy
        from jxl_tpu.core.io import read_image

        cfg = CodecConfig(
            distance=float(req.get("distance", 1.0)),
            effort=int(req.get("effort", 7)),
            strategy=Strategy[req.get("strategy", "BASELINE")],
            lanes=int(req.get("lanes", 256)),
        )
        rgb = read_image(req["input"])
        t0 = time.perf_counter()
        if int(req.get("stripes", 0)):
            from jxl_tpu.codec.tiled import encode_image_striped

            data = encode_image_striped(
                rgb, cfg, n_stripes=int(req["stripes"]),
                orig_name=os.path.basename(req["input"]),
            )
            with open(req["output"], "wb") as f:
                f.write(data)
            size = len(data)
        else:
            from jxl_tpu.codec.encode import encode_file

            size = encode_file(req["input"], req["output"], cfg)
        dt = time.perf_counter() - t0
        h, w = rgb.shape[:2]
        return {
            "ok": True,
            "msg": f"{req['output']}: {size} bytes, {size * 8 / (h * w):.3f} "
            f"bpp, {h * w / 1e6 / dt:.2f} MP/s",
        }
    if cmd == "decode":
        import time

        import numpy as np

        from jxl_tpu.codec.decode import decode_file

        t0 = time.perf_counter()
        px = decode_file(req["input"])
        dt = time.perf_counter() - t0
        from PIL import Image

        Image.fromarray(np.asarray(px)).save(req["output"])
        h, w = px.shape[:2]
        return {
            "ok": True,
            "msg": f"{req['output']}: {w}x{h}, {h * w / 1e6 / dt:.2f} MP/s",
        }
    if cmd == "shutdown":
        return {"ok": True, "msg": "bye", "_shutdown": True}
    return {"ok": False, "error": f"unknown cmd {cmd!r}"}


def serve(socket_path: str = DEFAULT_SOCKET, warm: bool = True) -> int:
    # warm the backend (tunnel session + a tiny program) before accepting
    if warm:
        import jax
        import jax.numpy as jnp

        jnp.add(jnp.ones(()), 1.0).block_until_ready()
        plat = jax.devices()[0].platform
    else:
        plat = "lazy"
    try:
        os.unlink(socket_path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    srv.listen(4)
    print(f"[serve] ready on {socket_path} (backend: {plat})", flush=True)
    try:
        while True:
            conn, _ = srv.accept()
            with conn:
                try:
                    # a silent client must not wedge the single-threaded
                    # accept loop; codec work itself runs with no deadline
                    conn.settimeout(10.0)
                    f = conn.makefile("rwb")
                    line = f.readline()
                    if not line:
                        continue
                    conn.settimeout(None)
                    try:
                        req = json.loads(line)
                        rep = _handle(req)
                    except Exception as e:  # clean error back to the client
                        rep = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                    f.write((json.dumps(rep) + "\n").encode())
                    f.flush()
                    if rep.get("_shutdown"):
                        return 0
                except OSError:
                    # client vanished mid-request (Ctrl-C, kill, timeout):
                    # drop the connection, keep serving
                    continue
    finally:
        srv.close()
        try:
            os.unlink(socket_path)
        except FileNotFoundError:
            pass


def try_forward(req: dict, socket_path: str = DEFAULT_SOCKET):
    """Forward a request to a running server; returns the reply dict or
    None when no server is reachable (caller then runs locally). Client
    side imports NO jax — the whole point is skipping backend startup."""
    if os.environ.get("JXL_TPU_NO_SERVER"):
        return None
    # A/B and calibration workflows steer the codec with JXL_TPU_* env
    # knobs; the SERVER's environment would silently govern a forwarded
    # request instead. Any codec knob set client-side disables forwarding
    # so the invocation runs locally under the requested configuration.
    _non_codec = {
        "JXL_TPU_NO_SERVER", "JXL_TPU_SOCKET", "JXL_TPU_PLATFORM",
        "JXL_TPU_CACHE_DIR", "JXL_TPU_NO_CACHE", "JXL_TPU_CPU_DEVICES",
    }
    if any(
        k.startswith("JXL_TPU_") and k not in _non_codec for k in os.environ
    ):
        return None
    if not os.path.exists(socket_path):
        return None
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.settimeout(5.0)
        c.connect(socket_path)
        c.settimeout(3600.0)  # codec work can legitimately take a while
        f = c.makefile("rwb")
        f.write((json.dumps(req) + "\n").encode())
        f.flush()
        line = f.readline()
        c.close()
        if not line:
            return None
        return json.loads(line)
    except (OSError, json.JSONDecodeError):
        return None
