from vsnca_tpu.pool.sample_pool import DevicePool, ListPool
