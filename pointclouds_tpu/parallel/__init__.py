"""pointclouds_tpu.parallel"""
