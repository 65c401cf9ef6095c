"""Pipeline plans: quality gates, medallion assembly, checkpoint caching."""
