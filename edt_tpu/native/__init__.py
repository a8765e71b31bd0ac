"""Native (C++) host-side components, loaded via ctypes.

Build once with: python -m edt_tpu.native.build
Absence is fine — pure-NumPy fallbacks in edt_tpu.rle take over.
"""
