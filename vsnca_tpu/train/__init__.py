from vsnca_tpu.train.multi import MultiStyleTrainer
from vsnca_tpu.train.optim import make_optimizer, normalize_grads
from vsnca_tpu.train.trainer import DyNCATrainer, make_train_step
