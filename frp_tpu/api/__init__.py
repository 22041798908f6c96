"""The HTTP + Socket.IO edge.

The reference fronts everything with FastAPI + python-socketio under uvicorn
(``backend/app/main.py``). None of those are dependencies here: the edge is
self-contained — an asyncio HTTP/1.1 server with routing, multipart parsing,
streaming responses (MJPEG), CORS, plus an RFC 6455 WebSocket implementation
speaking the Engine.IO v4 / Socket.IO v5 wire protocol the React dashboard's
socket.io-client uses (websocket-only transport, frontend/src/api.js:128-167).
Route contracts mirror SURVEY.md section 2.1 path-for-path.
"""
