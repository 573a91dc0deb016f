"""Remote viewer protocol server (SIBR-compatible TCP endpoint).

Parity with /root/reference/gaussian_renderer/network_gui.py (85 LoC): a
nonblocking localhost TCP server speaking the 3DGS SIBR remote-viewer wire
format — JSON message length-prefixed camera/toggle packets in, raw RGB bytes
out — so interactive viewers can watch training. The reference ships this
disabled (train.py:649 commented out); here it is a working opt-in:

    viewer = ViewerServer(host, port)
    ...inside the train loop:
    viewer.poll(lambda cam: render_fn(cam))
"""

from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Callable, Optional

import numpy as np

from .scene.cameras import MiniCam


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None
        self.addr = None

    def try_connect(self) -> None:
        try:
            self.conn, self.addr = self.listener.accept()
            self.conn.settimeout(None)
        except Exception:
            pass

    def _read(self) -> dict:
        messageLength = self.conn.recv(4)
        messageLength = int.from_bytes(messageLength, "little")
        message = self.conn.recv(messageLength)
        return json.loads(message.decode("utf-8"))

    def receive_camera(self):
        """One message -> (MiniCam | None, do_training, keep_alive, scale_mod)."""
        message = self._read()
        width = message["resolution_x"]
        height = message["resolution_y"]
        if width != 0 and height != 0:
            try:
                do_training = bool(message["train"])
                fovy = message["fov_y"]
                fovx = message["fov_x"]
                znear = message["z_near"]
                zfar = message["z_far"]
                keep_alive = bool(message["keep_alive"])
                scaling_modifier = message["scaling_modifier"]
                world_view = np.reshape(
                    np.array(message["view_matrix"]), (4, 4))
                world_view[:, 1] = -world_view[:, 1]
                world_view[:, 2] = -world_view[:, 2]
                full_proj = np.reshape(
                    np.array(message["view_projection_matrix"]), (4, 4))
                full_proj[:, 1] = -full_proj[:, 1]
                cam = MiniCam(width, height, fovy, fovx, znear, zfar,
                              world_view, full_proj)
            except Exception:
                traceback.print_exc()
                raise
            return cam, do_training, keep_alive, scaling_modifier
        return None, None, None, None

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def poll(self, render_fn: Callable, source_path: str = "",
             keep_training: bool = True) -> bool:
        """Service one viewer round; returns whether training should continue.

        render_fn(MiniCam, scaling_modifier) -> [H, W, 3] float image or None.
        """
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, do_training, keep_alive, scale_mod = self.receive_camera()
                img_bytes = None
                if cam is not None:
                    img = render_fn(cam, scale_mod)
                    if img is not None:
                        img_bytes = memoryview(
                            (np.clip(img, 0, 1) * 255).astype(np.uint8)
                        ).tobytes()
                self.send(img_bytes, source_path)
                # Empty-camera (zero-resolution) packets are keep-alives:
                # keep servicing the viewer (reference train.py's GUI loop
                # only breaks on a real camera message).
                if cam is not None and (do_training or not keep_alive):
                    return bool(do_training)
            except Exception:
                self.conn = None
        return keep_training

    def close(self) -> None:
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
