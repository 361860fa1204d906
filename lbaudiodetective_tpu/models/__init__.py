"""Model layer: the Fingerprint value type and the AudioDetective pipeline
object (the framework's 'flagship model')."""
