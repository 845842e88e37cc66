from fluidnet_tpu.utils.logger import Logger
from fluidnet_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from fluidnet_tpu.utils.flops import model_flops, model_peak_activation
from fluidnet_tpu.utils.profiler import Timer, profile_fprop
