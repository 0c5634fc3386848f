"""Sources & sinks: synthetic IoT generator (batch + streaming feed),
file/console/keyed sinks, bucketed writer."""
