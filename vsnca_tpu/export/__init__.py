from vsnca_tpu.export.checkpoint import save_checkpoint, load_checkpoint
