"""cyclebane_spark.streaming"""
