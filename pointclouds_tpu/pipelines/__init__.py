"""pointclouds_tpu.pipelines"""
