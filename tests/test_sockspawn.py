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
