from fluidnet_tpu.train.loss import fluid_loss, border_loss_weights
from fluidnet_tpu.train.train import (TrainState, make_train_step,
                                      make_eval_step, init_train_state)
