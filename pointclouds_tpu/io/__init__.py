"""pointclouds_tpu.io"""
