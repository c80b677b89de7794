"""Build the native library: python -m radish_pt_tpu.native.build"""

from . import _build_library, _LIB_PATH

if __name__ == "__main__":
    ok = _build_library()
    print(f"[radish native] {'built ' + _LIB_PATH if ok else 'BUILD FAILED'}")
