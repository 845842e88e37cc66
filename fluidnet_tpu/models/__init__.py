from fluidnet_tpu.models.fluidnet import (init_model, apply_model,
                                          make_model_fn, layer_spec)
