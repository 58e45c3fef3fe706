from armnet_tpu.train.metrics import masked_bce, masked_roc_auc
from armnet_tpu.train.step import TrainState, create_train_state, make_eval_step, make_train_step
