"""cyclebane_spark.multimodal"""
