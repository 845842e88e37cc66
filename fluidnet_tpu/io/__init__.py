from fluidnet_tpu.io.vbox import VboxWriter, read_vbox
from fluidnet_tpu.io.binvox import load_binvox
from fluidnet_tpu.io.obj_export import export_obstacles_obj
from fluidnet_tpu.io import voxel_utils
