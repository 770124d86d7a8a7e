from . import arcface, scrfd, genderage, landmark106, weights  # noqa: F401
