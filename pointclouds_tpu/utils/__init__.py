"""pointclouds_tpu.utils"""
