"""pointclouds_tpu.core"""
