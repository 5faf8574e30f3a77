"""HTTP synthesis server (reference server/server.py Flask app; SURVEY.md
SS3.4). Same routes — GET / (demo page) and GET /api/tts?text=... streaming
audio/wav — implemented on stdlib http.server (Flask is not available in the
build environment; the handler is a thin shim either way)."""

from __future__ import annotations

import html
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .synthesizer import Synthesizer

_INDEX_HTML = """<!DOCTYPE html>
<html><head><title>your-voice TTS (TPU)</title><style>
body { font-family: sans-serif; margin: 3em auto; max-width: 40em; }
input { width: 100%; padding: .5em; font-size: 1em; }
button { margin-top: .75em; padding: .5em 1.5em; }
</style></head><body>
<h2>your-voice TTS &mdash; TPU-native</h2>
<input id="text" placeholder="Type a sentence..." value="Hello, this is a test.">
<button onclick="speak()">Speak</button>
<p><audio id="audio" controls></audio></p>
<script>
function speak() {
  const t = document.getElementById('text').value;
  const a = document.getElementById('audio');
  a.src = '/api/tts?text=' + encodeURIComponent(t);
  a.play();
}
</script></body></html>"""


class TTSHandler(BaseHTTPRequestHandler):
    synthesizer: Synthesizer = None  # set by make_server
    lock: threading.Lock = None

    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, content_type: str, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/":
            self._send(200, "text/html; charset=utf-8", _INDEX_HTML.encode())
            return
        if parsed.path == "/api/tts":
            qs = urllib.parse.parse_qs(parsed.query)
            text = (qs.get("text") or [""])[0].strip()
            if not text:
                self._send(400, "application/json",
                           json.dumps({"error": "missing text parameter"}).encode())
                return
            speaker = (qs.get("speaker_id") or [None])[0]
            try:
                with self.lock:
                    wav = self.synthesizer.tts_to_wav_bytes(text, speaker=speaker)
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(500, "application/json",
                           json.dumps({"error": html.escape(str(e))}).encode())
                return
            self._send(200, "audio/wav", wav)
            return
        self._send(404, "application/json", b'{"error": "not found"}')


def make_server(synthesizer: Synthesizer, host: str = "0.0.0.0",
                port: int = 5002) -> ThreadingHTTPServer:
    handler = type("BoundTTSHandler", (TTSHandler,), {
        "synthesizer": synthesizer, "lock": threading.Lock()})
    return ThreadingHTTPServer((host, port), handler)
