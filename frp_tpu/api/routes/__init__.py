"""Route modules mirroring the reference's routers path-for-path
(SURVEY.md section 2.1): camera, face, federated, deepfake, alerts,
snapshot, async_tasks."""
