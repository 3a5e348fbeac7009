from .spec import ParamSpec, Spec  # noqa: F401
from .pkl_loader import load_checkpoint_file, align_state_dicts, convert_c2_names  # noqa: F401
from .transform import torch_state_to_jax, random_torch_state  # noqa: F401
