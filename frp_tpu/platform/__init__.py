"""Host-side services, behavior-compatible with the reference's service layer
(SURVEY.md section 2.1): camera/state registry, face service, cross-camera
tracking, alerts/notifications, async jobs, snapshot enhancement, health
checks — re-architected around the device-resident engine instead of
per-camera CPU threads."""
