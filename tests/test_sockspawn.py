"""Socket display auto-spawn: with no viewer listening, the driver forks
rockenfield and retry-connects (sockdrv.c:154-190 behavior)."""

import socket

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_socket_driver_autospawns_viewer(monkeypatch):
    from lucille_tpu.display.sockdrv import SocketDriver

    monkeypatch.delenv("LUCILLE_NO_SPAWN_VIEWER", raising=False)
    port = _free_port()
    drv = SocketDriver(port=port)
    assert drv.open("spawned.hdr", 8, 8) is not False
    assert drv.sock is not None  # connected to the spawned viewer
    assert drv._viewer is not None
    drv.write(0, 0, np.full((8, 8, 3), 0.5, np.float32))
    viewer = drv._viewer
    drv.close()
    # the viewer got COMMAND_FINISH and exited cleanly
    assert viewer.poll() == 0


def test_spawn_disabled_by_env(monkeypatch):
    from lucille_tpu.display.sockdrv import SocketDriver

    monkeypatch.setenv("LUCILLE_NO_SPAWN_VIEWER", "1")
    drv = SocketDriver(port=_free_port())
    assert drv.open("none.hdr", 4, 4) is False  # no viewer, no spawn
    assert drv._viewer is None


def test_framebuffer_routes_to_live_viewer(monkeypatch):
    """Display "framebuffer" shows live tiles headlessly: the driver
    auto-spawns the rockenfield viewer through the socket path
    (framebufferdrv.c's window, rebuilt on the sockdrv transport)."""
    from lucille_tpu.display.drivers import get_display_driver

    monkeypatch.delenv("LUCILLE_NO_SPAWN_VIEWER", raising=False)
    monkeypatch.setenv("LUCILLE_SOCKET_PORT", str(_free_port()))
    drv = get_display_driver("framebuffer")
    assert drv.open("0001.tif", 8, 8) is True
    assert drv._sock is not None and drv._sock.sock is not None
    viewer = drv._sock._viewer
    assert viewer is not None
    drv.write(0, 0, np.full((4, 8, 3), 0.25, np.float32))
    drv.close()
    assert viewer.poll() == 0


def test_framebuffer_falls_back_to_file(monkeypatch, tmp_path):
    """Viewer unavailable -> the reference's fallback chain lands the
    frame in a .hdr (render.c:430-513)."""
    from lucille_tpu.display.drivers import get_display_driver

    monkeypatch.setenv("LUCILLE_NO_SPAWN_VIEWER", "1")
    monkeypatch.setenv("LUCILLE_SOCKET_PORT", str(_free_port()))
    out = tmp_path / "fb_out.hdr"
    drv = get_display_driver("framebuffer")
    assert drv.open(str(out), 4, 4) is True
    drv.write(0, 0, np.full((4, 4, 3), 0.5, np.float32))
    drv.close()
    assert out.exists()
