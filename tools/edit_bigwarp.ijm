// Fiji macro: open a section pair in BigWarp for manual landmark editing
// (counterpart of reference tools/edit_bigwarp.ijm).
//
// Usage: drop two aligned-thumbnail images (moving, fixed) onto Fiji, run
// this macro, place/adjust landmarks, then File > Export landmarks to CSV.
// Convert the CSV into a match H5 with tools/convert_manual_thumbnail_matches.py
// (name the CSV '{moving}__to__{fixed}.csv').

setBatchMode(false);
ids = newArray(nImages);
titles = newArray(nImages);
for (i = 0; i < nImages; i++) {
    selectImage(i + 1);
    ids[i] = getImageID();
    titles[i] = getTitle();
}
if (nImages < 2) {
    exit("Open the moving and fixed thumbnails first (2 images).");
}
moving = titles[0];
fixed = titles[1];
run("Big Warp", "moving_image=[" + moving + "] target_image=[" + fixed + "]");
print("BigWarp launched: moving=" + moving + " fixed=" + fixed);
print("Export landmarks (File > Export landmarks) and convert with");
print("tools/convert_manual_thumbnail_matches.py");
