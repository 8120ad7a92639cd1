from .common import MLP
from .dnerf import DNeRFBasisNetwork, DNeRFHyperNetwork, DNeRFNetwork
from .ngp import NGPNetwork
from .sdf import SDFNetwork
from .tensorf import TensoRFNetwork, upsample_params

__all__ = ["MLP", "DNeRFNetwork", "DNeRFBasisNetwork", "DNeRFHyperNetwork", "NGPNetwork", "SDFNetwork", "TensoRFNetwork", "upsample_params"]
