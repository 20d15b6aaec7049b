"""Sources & sinks: columnar/text formats, partitioned + bucketed writes."""
