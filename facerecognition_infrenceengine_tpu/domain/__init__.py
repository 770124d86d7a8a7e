from .passes import generate_visitor_pass, qr_decode, qr_encode  # noqa: F401
