from armnet_tpu.utils.logging import AverageMeter, get_logger, remove_logger, seed_everything, time_since
