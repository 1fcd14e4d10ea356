"""Render aligned thumbnails from thumbnail tforms for quick stack QC
(reference: tools/render_aligned_thumbnails.py). Thin wrapper over the
thumbnail driver's render mode.

Usage: python render_aligned_thumbnails.py [--start S --stop E --step K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))

if __name__ == '__main__':
    import thumbnail_main
    thumbnail_main.main(['--mode', 'render'] + sys.argv[1:])
