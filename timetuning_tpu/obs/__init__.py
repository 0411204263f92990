from timetuning_tpu.obs.logging import MetricsWriter, dump_config, make_file_logger

__all__ = ["MetricsWriter", "dump_config", "make_file_logger"]
