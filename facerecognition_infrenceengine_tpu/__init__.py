"""TPU-native face-recognition inference framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
``bharatlytics/faceRecognition_InfrenceEngine``: face enrollment from
multi-pose photos, live multi-camera recognition, campus entry/exit counting
with unknown-person clustering, visitor/visit management with QR passes, and
the `/bharatlytics/v1` REST API — rebuilt TPU-first:

- detector cascade + 5-point alignment + ArcFace embedder fuse into one
  jitted XLA program fed by a dynamic micro-batcher (``engine/``),
- gallery matching is an L2-normalized embedding matmul + top-k sharded
  across a ``jax.sharding.Mesh`` (``parallel/``, ``ops/matching.py``),
- the MongoDB/GridFS document contracts of the reference are preserved by an
  embedded, Mongo-API-compatible document store (``store/``) that delegates
  to real pymongo when available,
- REST JSON contracts are served by a small WSGI framework (``web/``) with a
  Flask-like blueprint surface.

Reference behavior citations in docstrings use ``file:line`` into the
upstream snapshot (see SURVEY.md).
"""

__version__ = "0.1.0"
