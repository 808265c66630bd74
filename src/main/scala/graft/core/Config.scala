package graft.core

/** Exact-vs-regex dispatch enum.
  * Reference: download_file.py:14-21 (`--source-file-name-match-type`).
  */
sealed trait MatchType
object MatchType {
  case object ExactMatch extends MatchType
  case object RegexMatch extends MatchType

  def parse(s: String): MatchType = s match {
    case "exact_match" => ExactMatch
    case "regex_match" => RegexMatch
    case other =>
      throw new IllegalArgumentException(
        s"match type must be exact_match|regex_match, got '$other'")
  }
}

/** Which enumeration policy a blueprint uses on the multi-match path.
  * The reference's own blueprints diverge (SURVEY §2A-O4): download/upload
  * ALWAYS enumerate on the regex path; move/remove enumerate only when the
  * match set has more than one element. Move's behavior is canonical.
  */
sealed trait EnumeratePolicy
object EnumeratePolicy {
  /** `_1` even for a single regex match (download_file.py:254-258). */
  case object Always extends EnumeratePolicy
  /** enumerate only when >1 match (move_file.py:185-191). */
  case object IfMultiple extends EnumeratePolicy
}

/** Typed configs mirroring the four argparse surfaces
  * (download_file.py:11-41, upload_file.py:15-44, move_file.py:16-47,
  * remove_file.py:16-36). `bucket` is a URI root — `file:///tmp/bucket-a`
  * in tests, `gs://name` with the GCS connector configured.
  */
final case class DownloadConfig(
    bucket: String,
    sourceFolderName: String = "",
    sourceFileName: String,
    matchType: MatchType = MatchType.ExactMatch,
    destinationFolderName: String = "",
    destinationFileName: Option[String] = None)

final case class UploadConfig(
    bucket: String,
    sourceFolderName: String = "",
    sourceFileName: String,
    matchType: MatchType = MatchType.ExactMatch,
    destinationFolderName: String = "",
    destinationFileName: Option[String] = None)

final case class MoveConfig(
    sourceBucket: String,
    destinationBucket: String,
    sourceFolderName: String = "",
    sourceFileName: String,
    matchType: MatchType = MatchType.ExactMatch,
    destinationFolderName: String = "",
    destinationFileName: Option[String] = None)

final case class RemoveConfig(
    bucket: String,
    sourceFolderName: String = "",
    sourceFileName: String,
    matchType: MatchType = MatchType.ExactMatch)
