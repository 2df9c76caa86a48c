from .gmd import GMD  # noqa: F401
from .baseline import Baseline  # noqa: F401
from .build import build_model, model_config_from_params  # noqa: F401
