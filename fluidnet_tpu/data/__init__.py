from fluidnet_tpu.data.manta_io import load_manta_file, save_manta_file
from fluidnet_tpu.data.dataset import FluidDataset, PrefetchLoader
from fluidnet_tpu.data.generate import generate_dataset
