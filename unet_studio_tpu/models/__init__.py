from .dsl import LayerSpec, UNetSpec, parse_architecture, default_architecture
from .unet3d import UNet3d, init_params, forward, param_order
from .serialize import load_model, save_model
