"""HTTP API layer (aiohttp): REST surface parity with the reference's
httproutes.rs / httpapi crate — /api/v1 routes, /metrics, /api/internals,
and the OpenAPI document."""
