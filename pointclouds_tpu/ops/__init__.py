"""pointclouds_tpu.ops"""
