"""Sources & sinks: Kafka builders, synthetic frame source, multimodal."""
