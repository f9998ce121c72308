"""cyclebane_spark.sources"""
