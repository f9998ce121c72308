"""cyclebane_spark.operators"""
