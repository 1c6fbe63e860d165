"""pointclouds_tpu.spatial"""
