"""In-repo web applications (reference: src/helicon/webApps/).

The compute layers are native and importable without shiny; the app.py
UIs require the optional `shiny` extra.
"""
