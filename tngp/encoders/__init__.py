from .modules import (
    FreqEncoder,
    GridEncoder,
    IdentityEncoder,
    SHEncoder,
    get_encoder,
)

__all__ = ["FreqEncoder", "GridEncoder", "IdentityEncoder", "SHEncoder", "get_encoder"]
