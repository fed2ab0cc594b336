"""Operator modules. Importing timestream_travel_spark.registry.load_all()
pulls all of them in and populates the named-query registry."""
