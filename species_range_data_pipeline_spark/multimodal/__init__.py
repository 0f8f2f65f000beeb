"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` payload columns plus typed struct
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` / ``pandas_udf`` stages.

Real stdlib-only codecs (no image/audio libraries ship in the
container, so the formats are implemented at struct level, like the
GeoTIFF/shapefile lanes): PNG (all legal depths incl. sub-byte, Adam7) + BMP + WAV (``codecs.py``), baseline
and progressive JPEG including 4:2:0/4:2:2 subsampling and restart
markers (``jpeg.py``), GIF 87a/89a with real variable-width LZW and four-pass interlace (``gif.py``),
MP4/ISO-BMFF sample tables with MJPEG frame decode (``mp4.py``), and
spectral/resampling audio DSP (``audio_dsp.py``).  Formats that would
need an entropy/transform stack this container can't justify (MP3,
compressed video bitstreams)
raise ``NotImplementedError`` loudly at their exact gate.  The
deterministic FAKEIMG/FAKEVID/FAKEAUD codecs remain for fixture
generation (``media.py``)."""
