"""Execute the REFERENCE implementation (/root/reference, read-only) on
fixture inputs to produce golden outputs for Scala byte-identity tests.
Loads modules directly, bypassing src/__init__ (heavy deps absent)."""
import sys, types, importlib.util

m = types.ModuleType("dotenv"); m.load_dotenv = lambda *a, **k: None
sys.modules["dotenv"] = m
pkg = types.ModuleType("src"); pkg.__path__ = ["/root/reference/src"]
sys.modules["src"] = pkg

def load(name):
    spec = importlib.util.spec_from_file_location(
        f"src.{name}", f"/root/reference/src/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"src.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod

config = load("config")
tp = load("text_processor").TextProcessor()
da = load("document_analyzer").DocumentAnalyzer()
pa = load("paper_analyzer").PaperAnalyzer()

# app_enhanced-level functions (module imports streamlit etc. — extract
# behavior by executing only the needed defs is not possible; instead
# import with stubs)
def load_app_enhanced():
    from unittest.mock import MagicMock
    sys.modules.setdefault("streamlit", MagicMock())
    for name, attrs in [
        ("pdf_processor", ["PDFProcessor"]),
        ("vector_store", ["VectorStoreManager"]),
        ("conversation", ["ConversationManager", "ConversationError"]),
    ]:
        mod = types.ModuleType(f"src.{name}")
        for a in attrs:
            setattr(mod, a, type(a, (), {}) if a != "ConversationError"
                    else type(a, (Exception,), {}))
        sys.modules[f"src.{name}"] = mod
    spec = importlib.util.spec_from_file_location(
        "app_enhanced", "/root/reference/app_enhanced.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
