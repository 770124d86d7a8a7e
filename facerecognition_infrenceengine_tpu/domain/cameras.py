"""Live-recognition camera runtime (the inference server's data plane).

The reference spawns one capture process + one recognition process per
camera with mp.Queues (reference infrenceServer.py:565-679).  On TPU, one
process owns the chip and cameras are capture threads feeding the shared
MicroBatcher, so N streams batch into one jitted program.  Capture settings
(640x480@30, buffer 1) and drop-on-full semantics are preserved
(infrenceServer.py:581-584, :594-598); display (cv2.imshow) is optional and
off by default for headless serving.
"""

from __future__ import annotations

import logging
import threading
from typing import Callable, Dict, List

from ..core.config import Config, get_config
from ..engine.gallery import GalleryManager
from ..engine.microbatch import MicroBatcher
from ..engine.recognizer import FaceRecognitionProcessor

logger = logging.getLogger("fre.cameras")


class CameraManager:
    def __init__(self, gallery: GalleryManager, face_app=None,
                 cfg: Config | None = None, display: bool = False,
                 on_result: Callable | None = None):
        self.cfg = cfg or get_config()
        self.gallery = gallery
        self.face_app = face_app
        self.display = display
        self.on_result = on_result  # callback(source, frame, results)
        self.running = False
        self.threads: List[threading.Thread] = []
        self.batcher: MicroBatcher | None = None
        self.processor: FaceRecognitionProcessor | None = None

    def _ensure_runtime(self):
        if self.face_app is None:
            from ..models.zoo import FaceAnalysis

            self.face_app = FaceAnalysis(cfg=self.cfg.engine)
            self.face_app.prepare(ctx_id=0,
                                  det_thresh=self.cfg.thresholds.detection)
        if self.batcher is None:
            self.batcher = MicroBatcher(self.face_app, self.cfg.engine)
            self.batcher.start()
        if self.processor is None:
            self.processor = FaceRecognitionProcessor(
                self.gallery, face_app=self.face_app, cfg=self.cfg)

    def _capture_loop(self, source, company_id: str):
        import cv2

        import numpy as np

        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            logger.error("Failed to open camera %s", source)
            return
        cap.set(cv2.CAP_PROP_FRAME_WIDTH, 640)
        cap.set(cv2.CAP_PROP_FRAME_HEIGHT, 480)
        cap.set(cv2.CAP_PROP_FPS, 30)
        cap.set(cv2.CAP_PROP_BUFFERSIZE, 1)
        logger.info("Camera %s initialized", source)
        while self.running:
            ret, frame = cap.read()
            if not ret:
                continue
            future = self.batcher.submit(source, frame)
            try:
                faces = future.result(timeout=2)
            except Exception as e:
                logger.error("Recognition error on %s: %s", source, e)
                continue
            _, results = self.processor.match_faces(frame, faces, company_id,
                                                    draw=True)
            if self.on_result:
                self.on_result(source, frame, results)
            if self.display:
                cv2.imshow(f"Camera {source}", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    self.running = False
        cap.release()
        logger.info("Camera %s released", source)

    def start_cameras(self, sources: list, company_id: str):
        self._ensure_runtime()
        self.running = True
        for source in sources:
            t = threading.Thread(target=self._capture_loop,
                                 args=(source, company_id), daemon=True)
            t.start()
            self.threads.append(t)

    def stop_cameras(self):
        self.running = False
        for t in self.threads:
            t.join(timeout=5)
        self.threads.clear()
        if self.batcher:
            self.batcher.stop()
            self.batcher = None
