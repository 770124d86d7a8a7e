"""Live recognition processor with HUD overlay.

Re-implements the reference's ``FaceRecognitionProcessor``
(reference infrenceServer.py:400-563): detect faces, match against the
company gallery, draw the HUD (semi-transparent box, corner markers, D/R
confidence bars, info panel).  Matching goes through the GalleryManager's
device matmul on all faces of the frame at once instead of the per-face
Python scan (infrenceServer.py:538-542).
"""

from __future__ import annotations

import logging

import numpy as np

from ..core.config import Config, get_config
from .gallery import GalleryManager

logger = logging.getLogger("fre.recognizer")

GREEN = (0, 255, 0)
YELLOW = (0, 255, 255)
RED = (0, 0, 255)


def draw_enhanced_bounding_box(frame, bbox, color, person_info, detection_score,
                               recognition_score):
    """HUD drawing (reference infrenceServer.py:418-513).

    Same visual language as the reference — translucent box, bracketed
    corner markers, vertical D/R confidence bars, translucent info panel —
    rendered by the framework's own native rasterizer (native/imagecodec.cc)
    instead of OpenCV."""
    from .. import native

    frame = np.ascontiguousarray(frame)
    h, w = frame.shape[:2]
    x1, y1, x2, y2 = (int(v) for v in bbox)

    # translucent body + corner brackets (reference :430-447)
    native.fill_rect(frame, y1, x1, y2, x2, color, alpha=0.15)
    native.draw_rect(frame, y1, x1, y2, x2, color, thick=1)
    native.draw_corners(frame, y1, x1, y2, x2, color, length=15, thick=3)

    # vertical D/R confidence bars (reference :449-470)
    bar_x, bar_w = x2 + 10, 6
    det_h = int((y2 - y1) * min(float(detection_score), 1.0))
    native.draw_rect(frame, y1, bar_x, y2, bar_x + bar_w, (100, 100, 100), 1)
    native.fill_rect(frame, y2 - det_h, bar_x, y2, bar_x + bar_w, (255, 140, 0))
    native.draw_text(frame, max(0, y1 - 10), max(0, bar_x - 2), "D", (255, 255, 255))
    rec_h = int((y2 - y1) * min(float(recognition_score), 1.0))
    native.draw_rect(frame, y1, bar_x + 12, y2, bar_x + 12 + bar_w,
                     (100, 100, 100), 1)
    native.fill_rect(frame, y2 - rec_h, bar_x + 12, y2, bar_x + 12 + bar_w, color)
    native.draw_text(frame, max(0, y1 - 10), bar_x + 10, "R", (255, 255, 255))

    # info panel (reference :472-513)
    if person_info["type"] == "employee":
        info_lines = [f"Name: {person_info['name']}",
                      f"ID: {person_info['employeeId']}",
                      "Type: Employee",
                      f"Score: {recognition_score:.2f}"]
    elif person_info["type"] == "visitor":
        info_lines = [f"Name: {person_info['name']}",
                      "Type: Visitor",
                      f"Score: {recognition_score:.2f}"]
    else:
        info_lines = ["Unknown Person", f"Detection: {detection_score:.2f}"]

    char_w = 6  # 5x7 font + 1px spacing at scale 1
    panel_w = max(len(line) for line in info_lines) * char_w + 20
    panel_h = len(info_lines) * 12 + 10
    panel_x = max(0, min(x1, w - panel_w))
    panel_y = max(0, y2 + 10)
    if panel_y + panel_h > h:
        panel_y = max(0, y1 - panel_h - 10)
    native.fill_rect(frame, panel_y, panel_x, panel_y + panel_h,
                     panel_x + panel_w, (30, 30, 30), alpha=0.8)
    native.draw_rect(frame, panel_y, panel_x, panel_y + panel_h,
                     panel_x + panel_w, color, 1)
    for i, line in enumerate(info_lines):
        native.draw_text(frame, panel_y + 6 + i * 12, panel_x + 10, line,
                         (255, 255, 255))
    return frame


class FaceRecognitionProcessor:
    def __init__(self, gallery: GalleryManager, face_app=None,
                 cfg: Config | None = None):
        cfg = cfg or get_config()
        self.gallery = gallery
        self.face_app = face_app
        self.detection_threshold = cfg.thresholds.detection
        self.recognition_threshold = cfg.thresholds.recognition

    def _ensure_app(self):
        if self.face_app is None:
            from ..models.zoo import FaceAnalysis

            self.face_app = FaceAnalysis()
            self.face_app.prepare(ctx_id=0, det_thresh=self.detection_threshold)
        return self.face_app

    def recognize_faces(self, frame: np.ndarray, company_id: str,
                        draw: bool = True):
        """Detect + match all faces of one frame; optionally draw the HUD.

        Returns (frame, results) where results is a list of dicts with
        bbox/person_info/scores — the reference only returns the drawn frame
        (infrenceServer.py:515-563); the structured results feed tests and
        the counting pipeline."""
        app = self._ensure_app()
        faces = app.get(frame)
        return self.match_faces(frame, faces, company_id, draw=draw)

    def match_faces(self, frame: np.ndarray, faces: list, company_id: str,
                    draw: bool = True):
        """Match already-detected faces (e.g. from the micro-batcher) against
        the gallery and optionally draw the HUD — the single home of the
        threshold/color/annotation decision logic."""
        results = []
        if not faces:
            return frame, results
        embs = np.stack([f.normed_embedding for f in faces])
        # defensive renormalize, mirroring infrenceServer.py:532
        embs = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        scores, ids, metadata = self.gallery.match(embs, company_id=company_id)
        for face, score_row, id_row in zip(faces, scores, ids):
            best_score = float(score_row[0])
            best_id = id_row[0]
            # explicit matched flag — float truthiness of the score would
            # call a legitimate 0.0-score match (threshold <= 0) unmatched
            # while the HUD drew it as recognized
            matched = (best_id is not None
                       and best_score >= self.recognition_threshold)
            if matched:
                person_info = metadata[best_id]
                color = GREEN if person_info["type"] == "employee" else YELLOW
                recognition_score = best_score
            else:
                person_info = {"name": "Unknown", "type": "unknown"}
                color = RED
                recognition_score = 0.0
            results.append({
                "bbox": face.bbox.astype(int).tolist(),
                "det_score": face.det_score,
                "person_id": best_id if matched else None,
                "person_info": person_info,
                "similarity": best_score,
                "recognized": matched,
            })
            if draw:
                frame = draw_enhanced_bounding_box(
                    frame, face.bbox.astype(int), color, person_info,
                    face.det_score, recognition_score)
        return frame, results
