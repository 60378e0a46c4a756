from .mlp import MLP  # noqa: F401
from .gnn import TimeGNN  # noqa: F401
from .layoutnet import LayoutNet  # noqa: F401
from .unet import UNet  # noqa: F401
from .fusion import PathModel  # noqa: F401
