import java.io.File;
import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/** Test seam: serves the s3a:// scheme from the local filesystem so the
 *  binaryFile/parquet readers and the streaming source can be exercised
 *  against s3a URIs without AWS. FileStatus permissions are materialized
 *  eagerly because RawLocalFileSystem's lazy loader requires file:// URIs.
 *  Object-store semantic differences (listing consistency, no rename) are
 *  out of scope for the seam test. */
public class FakeS3AFileSystem extends RawLocalFileSystem {
  @Override public URI getUri() { return URI.create("s3a:///"); }
  @Override public String getScheme() { return "s3a"; }
  @Override protected void checkPath(Path path) { /* accept s3a paths */ }
  @Override public File pathToFile(Path path) {
    return new File(path.toUri().getPath());
  }
  private FileStatus sanitize(FileStatus s) {
    return new FileStatus(s.getLen(), s.isDirectory(), s.getReplication(),
        s.getBlockSize(), s.getModificationTime(), s.getAccessTime(),
        FsPermission.createImmutable((short) 0755), "spark", "spark", s.getPath());
  }
  @Override public FileStatus getFileStatus(Path f) throws IOException {
    return sanitize(super.getFileStatus(f));
  }
  @Override public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus[] ss = super.listStatus(f);
    FileStatus[] out = new FileStatus[ss.length];
    for (int i = 0; i < ss.length; i++) out[i] = sanitize(ss[i]);
    return out;
  }
}
